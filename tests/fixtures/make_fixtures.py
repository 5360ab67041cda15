"""Generate the checked-in mini SIFT-format fixtures (deterministic).

The files mimic the TEXMEX/bigann binary layouts the reference loads
(graphann/loader.go: bvecs base vectors, fvecs queries, ivecs ground truth)
at toy scale, INCLUDING the reference loader test's spot-value semantics
(loader_test.go:29-35: vectors[0][3] == 1.0, vectors[1][0] == 65.0).

Run from the repo root to regenerate:  python tests/fixtures/make_fixtures.py
"""

import os

import numpy as np

N, DIM, Q, K = 256, 128, 8, 10
HERE = os.path.dirname(os.path.abspath(__file__))


def write_vecs(path: str, mat: np.ndarray, elem_dtype) -> None:
    n, dim = mat.shape
    hdr = np.full((n, 1), dim, "<i4")
    body = np.ascontiguousarray(mat.astype(elem_dtype))
    rows = np.concatenate([hdr.view("<u1"),
                           body.view("<u1").reshape(n, -1)], axis=1)
    rows.tofile(path)


def main() -> None:
    rng = np.random.default_rng(20260819)
    base = rng.integers(0, 256, size=(N, DIM)).astype(np.uint8)
    # the reference loader test's exact spot values (loader_test.go:29-35)
    base[0, 3] = 1
    base[1, 0] = 65
    queries = rng.random((Q, DIM)).astype(np.float32) * 255.0

    d = ((base.astype(np.float32)[None, :, :]
          - queries[:, None, :]) ** 2).sum(-1)
    gnd = np.argsort(d, axis=1, kind="stable")[:, :K].astype(np.int32)

    write_vecs(os.path.join(HERE, "mini_base.bvecs"), base, "<u1")
    write_vecs(os.path.join(HERE, "mini_query.fvecs"), queries, "<f4")
    write_vecs(os.path.join(HERE, "mini_gnd.ivecs"), gnd, "<i4")
    print(f"wrote mini_base.bvecs ({N}x{DIM} u8), mini_query.fvecs "
          f"({Q}x{DIM} f32), mini_gnd.ivecs ({Q}x{K} i32)")


if __name__ == "__main__":
    main()
