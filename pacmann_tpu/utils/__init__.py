from pacmann_tpu.utils.platform import on_tpu, default_interpret  # noqa: F401
