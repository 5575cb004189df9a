"""On-chip correctness smoke across every weight format (default hints).

Interpret-mode tests cannot catch Mosaic lowering gaps (this sweep found
the NF4 gather and e5m2 uint-cast hardware-only failures, 2026-08-17).
Run once per libtpu bump. Note: e5m2's +-57344 range overflows f16
outputs — inf in BOTH kernel and oracle is agreement, not failure, so the
comparison masks positions where both sides are non-finite and equal.
"""
import numpy as np, jax.numpy as jnp
from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
from bitblas_tpu.kernels.spec import KernelSpec
from bitblas_tpu.ops.matmul_config import MatmulConfig
from bitblas_tpu.ops.reference import matmul_reference
from bitblas_tpu.ops.weight_transform import transform_reference_operands
from bitblas_tpu.testing import random_reference_operands
from bitblas_tpu.tuner import default_hint, get_arch

GS = dict(with_scaling=True, group_size=128)
# int-activation rows (BitNet/W4A8 serving paths): hardware-only lowering
# gaps here escaped the float-act-only smoke until the 2026-08-20
# support-matrix sweep (S4 activations wedged the backend client).
IA = dict(accum_dtype="int32", out_dtype="float32")
CASES = [
    ("uint4", "float16", GS),
    ("int4", "float16", GS),
    ("int2", "float16", GS),
    ("nf4", "float16", GS),
    ("fp4_e2m1", "float16", GS),
    ("e4m3_float8", "float16", {}),
    ("e5m2_float8", "float16", {}),
    ("uint2", "float16", GS),
    ("uint1", "float16", GS),
    ("int1", "float16", {}),
    ("int8", "float16", {}),
    ("int16", "float16", {}),
    ("int32", "float16", {}),
    ("int2", "int8", IA),
    ("uint4", "int8", dict(with_scaling=True, group_size=128,
                           out_dtype="float32")),
    ("uint2", "int8", IA),
    ("int1", "int8", IA),
]
failures = 0
for w, a, kw in CASES:
    try:
        kw = dict(kw)
        kw.setdefault("out_dtype", "float16")
        cfg = MatmulConfig(M=16, N=512, K=512, A_dtype=a,
                           W_dtype=w, **kw)
        spec = KernelSpec.from_config(cfg, 16)
        hint = default_hint(spec, get_arch())
        ops = random_reference_operands(cfg, 16, 0)
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        kf = make_dequant_matmul(spec, hint)
        s = None if dw.scales is None else jnp.asarray(dw.scales)
        out = kf(jnp.asarray(ops.A), jnp.asarray(dw.qweight), scales=s)
        ref = matmul_reference(cfg, ops.A, ops.qweight,
                               None if ops.scales is None
                               else jnp.asarray(ops.scales))
        r = np.asarray(ref, np.float32)
        o = np.asarray(out, np.float32)
        # Non-finite positions agree iff bit-identical (inf sign included);
        # compare the rest numerically.
        both_bad = ~np.isfinite(r) & (o == r)
        cmp = np.where(both_bad, 0.0, o - np.where(np.isfinite(r), r, 0.0))
        den = max(float(np.max(np.abs(r[np.isfinite(r)]))), 1e-9)
        rel = float(np.max(np.abs(cmp))) / den
        bad = "" if rel < 1e-2 else "  <-- WRONG"
        failures += bool(bad)
        print(f"{w}x{a}"[:18].ljust(18) + f": rel err {rel:.2e} "
              f"({hint.short_name()}){bad}",
              flush=True)
    except Exception as ex:
        failures += 1
        print(f"{w}x{a}"[:18].ljust(18) + f": FAIL {str(ex)[:100]}", flush=True)
# Native sub-byte compute (int4xint4 -> int8-staged XLA dense dot): the
# cell that actually failed in the 2026-08-20 sweep; distinct lowering
# surface from every dequant row above.
try:
    from bitblas_tpu.kernels.dense import make_dense_matmul
    cfg = MatmulConfig(M=16, N=512, K=512, A_dtype="int4", W_dtype="int4",
                       accum_dtype="int32", out_dtype="float32")
    spec = KernelSpec.from_config(cfg, 16)
    hint = default_hint(spec, get_arch())
    ops = random_reference_operands(cfg, 16, 0)
    kf = make_dense_matmul(spec, hint)
    o = np.asarray(kf(jnp.asarray(ops.A), jnp.asarray(ops.qweight)),
                   np.float32)
    r = np.asarray(matmul_reference(cfg, jnp.asarray(ops.A),
                                    jnp.asarray(ops.qweight)), np.float32)
    rel = float(np.max(np.abs(o - r))) / max(float(np.max(np.abs(r))), 1e-9)
    bad = "" if rel < 1e-2 else "  <-- WRONG"
    failures += bool(bad)
    print(f"native int4xint4  : rel err {rel:.2e}{bad}", flush=True)
except Exception as ex:
    failures += 1
    print(f"native int4xint4  : FAIL {str(ex)[:100]}", flush=True)

# asplit plan (kernels/asplit.py) across the sub-byte int/uint formats:
# the inner int8 telescope at asplit tile shapes is a distinct Mosaic
# lowering surface from the default-hint sweep above.
from bitblas_tpu.kernels.asplit import supports_asplit
from bitblas_tpu.tuner import TileHint

ASPLIT = TileHint(block_m=256, block_n=512, block_k=512,
                  mma_dtype="int8", decode_mode="asplit")
for w, kw in [("uint4", GS), ("int4", {}), ("uint2", GS), ("int2", {}),
              ("uint1", GS)]:
    try:
        cfg = MatmulConfig(M=16, N=512, K=512, A_dtype="float16",
                           W_dtype=w, out_dtype="float16", **kw)
        spec = KernelSpec.from_config(cfg, 16)
        if not supports_asplit(spec, ASPLIT):
            continue
        ops = random_reference_operands(cfg, 16, 0)
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        kf = make_dequant_matmul(spec, ASPLIT)
        s = None if dw.scales is None else jnp.asarray(dw.scales)
        out = kf(jnp.asarray(ops.A), jnp.asarray(dw.qweight), scales=s)
        ref = matmul_reference(cfg, ops.A, ops.qweight,
                               None if ops.scales is None
                               else jnp.asarray(ops.scales))
        r = np.asarray(ref, np.float32)
        o = np.asarray(out, np.float32)
        rel = float(np.max(np.abs(o - r))) / max(float(np.max(np.abs(r))),
                                                 1e-9)
        bad = "" if rel < 1e-2 else "  <-- WRONG"
        failures += bool(bad)
        print(f"asplit {w:8s}: rel err {rel:.2e}{bad}", flush=True)
    except Exception as ex:
        failures += 1
        print(f"asplit {w:8s}: FAIL {str(ex)[:100]}", flush=True)

# Quantized conv, materialize route (the default): XLA decode reshape/
# stack/transpose + native conv — a lowering surface distinct from the
# GEMM sweeps above. Checked against the fused im2col route.
try:
    from bitblas_tpu.ops.conv2d import QuantConv2D, QuantConv2DConfig
    base = dict(N=2, C=32, H=8, W=8, F=64, K=3, S=1, P=1,
                W_dtype="uint4", group_size=-1, with_scaling=True)
    op_m = QuantConv2D(QuantConv2DConfig(**base, route="materialize"),
                       enable_tuning=False)
    op_f = QuantConv2D(QuantConv2DConfig(**base, route="fused"),
                       enable_tuning=False)
    rng = np.random.default_rng(5)
    codes = rng.integers(0, 16, (3, 3, 32, 64)).astype(np.uint8)
    scale = (np.abs(rng.standard_normal((64, 1))) * 0.1 + 0.01).astype(
        np.float16)
    packed = op_m.transform_weight(codes, scale=scale)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 32)).astype(np.float16))
    o = np.asarray(op_m.forward(x, *packed), np.float32)
    r = np.asarray(op_f.forward(x, *packed), np.float32)
    rel = float(np.max(np.abs(o - r))) / max(float(np.max(np.abs(r))), 1e-9)
    bad = "" if rel < 2e-2 else "  <-- WRONG"
    failures += bool(bad)
    print(f"quantconv mat/fused: rel err {rel:.2e}{bad}", flush=True)
except Exception as ex:
    failures += 1
    print(f"quantconv mat/fused: FAIL {str(ex)[:100]}", flush=True)

# Pallas segment-decode kernel (materialize default since 2026-08-20):
# every family x zeros-mode it advertises, vs the XLA decode oracle.
from bitblas_tpu.kernels.materialize import (make_weight_decode_int8,
                                             make_weight_decode_int8_pallas,
                                             make_weight_decode_pallas,
                                             make_weight_dequant)

DECODE_CASES = [
    ("uint4", dict(with_scaling=True, group_size=128)),
    ("uint4", dict(with_scaling=True, with_zeros=True,
                   zeros_mode="quantized", group_size=128)),
    ("int2", {}),
    ("nf4", dict(with_scaling=True, group_size=64)),
    ("fp4_e2m1", dict(with_scaling=True, group_size=128)),
    ("e4m3_float8", {}),
    ("e5m2_float8", {}),   # e5m2 casts failed hardware-only before
]
for w, kw in DECODE_CASES:
    try:
        cfg = MatmulConfig(M=16, N=512, K=512, A_dtype="float16",
                           out_dtype="float16", W_dtype=w, **kw)
        spec = KernelSpec.from_config(cfg, 16)
        ops = random_reference_operands(cfg, 16, 0)
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales,
                                          zeros=ops.zeros,
                                          qzeros=ops.qzeros)
        s = None if dw.scales is None else jnp.asarray(dw.scales)
        z = None if dw.zeros is None else jnp.asarray(dw.zeros)
        ref = np.asarray(make_weight_dequant(spec, "float32")(
            jnp.asarray(dw.qweight), s, z))
        got = np.asarray(make_weight_decode_pallas(spec, "float32")(
            jnp.asarray(dw.qweight), s, z))
        rel = float(np.max(np.abs(ref - got)))
        bad = "" if rel == 0 else "  <-- WRONG"
        failures += bool(bad)
        print(f"pdecode {w:12s}: max abs {rel:.2e}{bad}", flush=True)
    except Exception as ex:
        failures += 1
        print(f"pdecode {w:12s}: FAIL {str(ex)[:100]}", flush=True)

for w in ("int2", "uint2", "int4", "uint4"):
    try:
        cfg = MatmulConfig(M=16, N=512, K=512, A_dtype="int8", W_dtype=w,
                           accum_dtype="int32", out_dtype="float32")
        spec = KernelSpec.from_config(cfg, 16)
        ops = random_reference_operands(cfg, 16, 0)
        dw = transform_reference_operands(cfg, ops.qweight, None)
        ref = np.asarray(make_weight_decode_int8(spec)(
            jnp.asarray(dw.qweight)))
        got = np.asarray(make_weight_decode_int8_pallas(spec)(
            jnp.asarray(dw.qweight)))
        ok = np.array_equal(ref, got)
        failures += not ok
        print(f"pdecode i8codes {w:5s}: {'exact' if ok else '<-- WRONG'}",
              flush=True)
    except Exception as ex:
        failures += 1
        print(f"pdecode i8codes {w:5s}: FAIL {str(ex)[:100]}", flush=True)

print(f"DONE {failures}")
raise SystemExit(1 if failures else 0)
