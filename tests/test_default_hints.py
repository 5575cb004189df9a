"""default_hint must keep returning the measured winners for the bench
grid, and stay stable on the SERVING spec variants (with_zeros +
fast_decoding uint4 — the KernelSpec a cold-DB QuantLlama actually
resolves; it differs from the bench grid and is costed differently).
A space-heuristic edit that silently changes these tiles costs recorded
perf (the curated table covers the same cells, but only for the two
swept nk; default_hint covers everything else by generalizing them)."""

import pytest

from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.tuner import default_hint
from bitblas_tpu.tuner.arch import get_arch

ARCH = get_arch("tpu_v5e")

# (w, a, m, nk) -> expected (bm, bn, bk, mma, decode) — in-window measured
# winners (docs/Benchmarks.md; CLAUDE.md round-3/4 findings).
EXPECTED = {
    ("int2", "int8", 1, 4096): (8, 2048, 2048, "int8", "telescope"),
    ("int2", "int8", 16, 4096): (16, 2048, 2048, "int8", "telescope"),
    ("int2", "int8", 16, 8192): (16, 2048, 8192, "int8", "telescope"),
    ("int2", "int8", 4096, 4096): (2048, 2048, 1024, "int8", "mask"),
    ("int2", "int8", 4096, 8192): (2048, 2048, 1024, "int8", "mask"),
    ("uint4", "float16", 1, 4096): (8, 256, 4096, "float32", "telescope"),
    ("uint4", "float16", 16, 4096): (16, 512, 4096, "float32", "telescope"),
    ("uint4", "float16", 16, 8192): (16, 512, 8192, "float32", "telescope"),
}


def _config(w, a, m, nk):
    if w == "uint4":
        return MatmulConfig(M=m, N=nk, K=nk, A_dtype=a, W_dtype=w,
                            with_scaling=True, group_size=128,
                            fast_decoding=False, out_dtype="float16")
    return MatmulConfig(M=m, N=nk, K=nk, A_dtype=a, W_dtype=w,
                        accum_dtype="int32", out_dtype="float32")


# Serving spec variant: with_zeros + fast_decoding uint4 (QuantLlama's
# cold-DB KernelSpec, models/quant_llama.py:112) — pinned to the current
# resolution so space edits touching the zeros/fast-decoding branches
# can't silently retile serving. (These cells share the measured exact-m
# small-M family; m=256 resolves to the whole-K bf16 GEMM tile.)
SERVING = {
    1: (8, 256, 4096, "float32", "telescope"),
    16: (16, 512, 4096, "float32", "telescope"),
    256: (256, 1024, 4096, "bfloat16", "telescope"),
}


@pytest.mark.parametrize("m", sorted(SERVING))
def test_default_hint_serving_spec(m):
    cfg = MatmulConfig(M=m, N=4096, K=4096, A_dtype="float16",
                       W_dtype="uint4", with_scaling=True, with_zeros=True,
                       zeros_mode="original", group_size=128,
                       out_dtype="float16")
    spec = KernelSpec.from_config(cfg, m)
    h = default_hint(spec, ARCH)
    got = (h.block_m, h.block_n, h.block_k, h.mma_dtype, h.decode_mode)
    assert got == SERVING[m], f"serving m={m}: drifted to {got}"


@pytest.mark.parametrize("key", sorted(EXPECTED))
def test_default_hint_measured_winner(key):
    w, a, m, nk = key
    spec = KernelSpec.from_config(_config(w, a, m, nk), m)
    h = default_hint(spec, ARCH)
    bm, bn, bk, mma, dm = EXPECTED[key]
    got = (h.block_m, h.block_n, h.block_k, h.mma_dtype, h.decode_mode)
    assert got == (bm, bn, bk, mma, dm), (
        f"{key}: default_hint drifted to {got}")


def test_default_hint_w2a8_grouped_scaling_avoids_mask():
    """Grouped-scaled 2-bit int-act mask tiles HTTP-500 this libtpu's
    Mosaic (tpu_w2a8_scaled_probe 2026-08-20); the probe-measured winner
    t1024x2048x1024_int8_telescope must be the default, and the
    hardware-space enumeration must not contain int8-mask hints at all."""
    cfg = MatmulConfig(M=4096, N=4096, K=4096, A_dtype="int8",
                       W_dtype="uint2", accum_dtype="int32",
                       out_dtype="float32", with_scaling=True,
                       group_size=128)
    spec = KernelSpec.from_config(cfg, 4096)
    h = default_hint(spec, ARCH)
    assert (h.block_m, h.block_n, h.block_k, h.mma_dtype,
            h.decode_mode) == (1024, 2048, 1024, "int8", "telescope")
    from bitblas_tpu.tuner.space import enumerate_hints
    from bitblas_tpu.tuner import get_arch
    hw = get_arch("v5e")
    if not hw.is_cpu:
        assert not any(x.decode_mode == "mask" and x.mma_dtype == "int8"
                       for x in enumerate_hints(spec, hw))
