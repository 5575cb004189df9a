"""Every committed curated winner must stay buildable.

The curated table (tuner/curated.py) is the only tuned state that
survives host/DB wipes, and bench.py + serving dispatch through it — a
tile that stopped tracing (or stopped fitting VMEM) would silently fall
to the safe fallback and cost recorded perf. Trace-level only
(jax.eval_shape): no kernel execution, so the full 4096^2/8192^2 bench
shapes stay fast on CPU."""

import jax
import jax.numpy as jnp
import pytest

from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.tuner import get_arch
from bitblas_tpu.tuner.curated import curated_hint
from bitblas_tpu.tuner.space import vmem_usage

GRID = [(w, a, m, nk)
        for (w, a) in (("uint4", "float16"), ("int2", "int8"))
        for m in (1, 16, 256, 4096)
        for nk in (4096, 8192)]


def _config(w, a, m, nk):
    if w == "uint4":
        return MatmulConfig(M=m, N=nk, K=nk, A_dtype=a, W_dtype=w,
                            with_scaling=True, group_size=128,
                            fast_decoding=False, out_dtype="float16")
    return MatmulConfig(M=m, N=nk, K=nk, A_dtype=a, W_dtype=w,
                        accum_dtype="int32", out_dtype="float32")


@pytest.mark.parametrize("w,a,m,nk", GRID)
def test_curated_hint_traces_and_fits(w, a, m, nk):
    hint = curated_hint(w, a, m, nk=nk)
    assert hint is not None, "headline grid cell lost its curated entry"
    cfg = _config(w, a, m, nk)
    spec = KernelSpec.from_config(cfg, m)

    budget = get_arch("tpu_v5e").vmem_bytes
    used = vmem_usage(spec, hint)
    assert used <= budget, (
        f"{hint.short_name()} needs {used/2**20:.1f} MiB VMEM "
        f"(budget {budget/2**20:.1f})")

    kf = make_dequant_matmul(spec, hint, interpret=True)
    A = jax.ShapeDtypeStruct((m, nk), jnp.float16 if a == "float16"
                             else jnp.int8)
    # device packed-weight layout is int8 words [K, N_padded*bits/8]
    # (ops/weight_transform.reference_weight_to_device)
    W = jax.ShapeDtypeStruct(spec.packed_k_major_shape, jnp.int8)
    if cfg.with_scaling:
        # device scales layout: [K/g, 1, N_padded] (weight_transform)
        S = jax.ShapeDtypeStruct(
            (nk // cfg.effective_group_size, 1, spec.n_padded), jnp.float32)
        out = jax.eval_shape(lambda A, W, S: kf(A, W, scales=S), A, W, S)
    else:
        out = jax.eval_shape(kf, A, W)
    assert out.shape == (m, nk)
