"""Generate the committed GPTQ golden artifact (tests/golden/).

Produces AutoGPTQ-format tensors exactly as `CudaOldQuantLinear.pack`
lays them out (behavior studied from the reference integration,
/root/reference/integration/pytorch/bitblas_quant_linear.py and
/root/reference/testing/python/module/test_repack_from_gptq.py:1-72):

  qweight : int32 [in*bits/32, out]   nibbles packed along in, LSB-first
  qzeros  : int32 [in/g, out*bits/32] packed along out; v1 stores zeros-1
            (the famous AutoGPTQ off-by-one), v2 (GPTQModel) stores zeros
  scales  : f16   [in/g, out]

plus the *ground-truth dequantized weight* computed with AutoGPTQ's own
dequant formula w[k, n] = s[g, n] * (q[k, n] - z[g, n]), and a forward
output for a fixed small-integer activation. Any drift in our repack or
device packing layout breaks bit-identity against these tensors.

Two layers are emitted so the test can chain a 2-layer model.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

IN, OUT, G, BITS = 256, 256, 64, 4
M = 16


def autogptq_pack(intweight_ko, zeros_go, scales_go, v2=False):
    """intweight [in, out] uint4 codes; zeros/scales [in/g, out].
    Returns (qweight, qzeros, scales) in AutoGPTQ CudaOldQuantLinear
    storage layout."""
    e32 = 32 // BITS
    iw = intweight_ko.astype(np.uint32)
    qweight = np.zeros((IN // e32, OUT), np.uint32)
    for row in range(qweight.shape[0]):
        for j in range(e32):
            qweight[row] |= iw[row * e32 + j] << (BITS * j)
    z = zeros_go.astype(np.int64) - (0 if v2 else 1)  # v1 off-by-one
    z = (z & 0xF).astype(np.uint32)
    qzeros = np.zeros((IN // G, OUT // e32), np.uint32)
    for col in range(qzeros.shape[1]):
        for j in range(e32):
            qzeros[:, col] |= z[:, col * e32 + j] << (BITS * j)
    return (qweight.astype(np.int32), qzeros.astype(np.int32),
            scales_go.astype(np.float16))


def main():
    rng = np.random.default_rng(1234)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)

    # Small-integer activations: every cast (f16 -> bf16/f32) is exact, so
    # the dequant identity check can demand bit-identity.
    x = rng.integers(-4, 5, (M, IN)).astype(np.float16)

    blobs = {"x": x}
    for li in (1, 2):
        intweight = rng.integers(0, 16, (IN, OUT)).astype(np.uint8)
        zeros = rng.integers(1, 15, (IN // G, OUT)).astype(np.int32)
        scales = ((rng.standard_normal((IN // G, OUT)) * 0.005 + 0.02)
                  .astype(np.float16))
        qweight, qzeros, sc = autogptq_pack(intweight, zeros, scales)
        qweight_v2, qzeros_v2, _ = autogptq_pack(intweight, zeros, scales,
                                                 v2=True)
        # ground-truth dequant (AutoGPTQ formula), f32 exact
        s_full = np.repeat(scales.astype(np.float32), G, axis=0)
        z_full = np.repeat(zeros.astype(np.float32), G, axis=0)
        dequant_w = s_full * (intweight.astype(np.float32) - z_full)  # [in,out]
        blobs.update({
            f"l{li}/qweight": qweight, f"l{li}/qzeros": qzeros,
            f"l{li}/qweight_v2": qweight_v2, f"l{li}/qzeros_v2": qzeros_v2,
            f"l{li}/scales": sc, f"l{li}/intweight": intweight,
            f"l{li}/zeros": zeros, f"l{li}/dequant_w": dequant_w,
        })

    # 2-layer forward ground truth with f16 rounding between layers
    h = (x.astype(np.float32) @ blobs["l1/dequant_w"]).astype(np.float16)
    logits = h.astype(np.float32) @ blobs["l2/dequant_w"]
    blobs["hidden"] = h
    blobs["logits"] = logits.astype(np.float32)

    path = os.path.join(out_dir, "gptq_golden_256x256_g64.npz")
    np.savez_compressed(path, **blobs)
    print("wrote", path, os.path.getsize(path), "bytes")


if __name__ == "__main__":
    main()
