"""PianoPIR protocol stack: single-partition core, batch schedulers, and
device/sharded engines."""

from pacmann_tpu.pir.params import derive_batch_params, derive_piano_params  # noqa: F401
from pacmann_tpu.pir.piano import PianoPIR  # noqa: F401
from pacmann_tpu.pir.batch import SimpleBatchPianoPIR  # noqa: F401
from pacmann_tpu.pir.engine import FusedBatchPianoPIR  # noqa: F401
from pacmann_tpu.pir.device_engine import DevicePianoEngine  # noqa: F401
