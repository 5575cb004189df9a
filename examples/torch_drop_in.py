"""Torch drop-in integration example (reference
integration/pytorch/bitblas_quant_linear.py usage pattern).

A torch model owner swaps an fp Linear for
`bitblas_tpu.integration.pytorch.QuantLinear`: pack() quantizes the
fake-quantized layer, the forward runs the fused TPU dequant kernel, and
the state_dict interchanges with the reference layout. Also shows the
BitNet b1.58 conversion (`BitLinearBitBLAS.from_bit_linear`).

Usage: PYTHONPATH=.:$PYTHONPATH python examples/torch_drop_in.py [--cpu]
"""

# --cpu: run on the host CPU instead of the TPU — the axon plugin ignores
# JAX_PLATFORMS, so this must be set in-process before the first jax use.
import sys as _sys
if "--cpu" in _sys.argv:
    _sys.argv.remove("--cpu")
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import numpy as np
import torch

from bitblas_tpu.integration.bitnet import BitLinearBitBLAS
from bitblas_tpu.integration.pytorch import QuantLinear


def main():
    torch.manual_seed(0)
    in_f, out_f, bits, gs = 1024, 1024, 4, 128

    # -- GPTQ-style weight-only linear -----------------------------------
    # Fake-quantized master layer (what a quantizer hands you).
    rng = np.random.default_rng(0)
    groups = in_f // gs
    scales = torch.from_numpy(
        rng.uniform(0.01, 0.05, (out_f, groups)).astype(np.float32))
    zeros = torch.from_numpy(
        rng.integers(0, 2**bits, (out_f, groups)).astype(np.float32))
    codes = rng.integers(0, 2**bits, (out_f, in_f)).astype(np.float32)
    g_idx = np.arange(in_f) // gs
    w = (codes - zeros.numpy()[:, g_idx]) * scales.numpy()[:, g_idx]
    lin = torch.nn.Linear(in_f, out_f, bias=False)
    lin.weight.data = torch.from_numpy(w.astype(np.float32))

    ql = QuantLinear(bits=bits, group_size=gs, in_features=in_f,
                     out_features=out_f, bias=False, enable_tuning=False)
    ql.pack(lin, scales, zeros)

    x = torch.randn(8, in_f)
    got, want = ql(x), lin(x)
    rel = (got - want).abs().max() / want.abs().max()
    print(f"QuantLinear w{bits}g{gs}: max rel err vs fp linear "
          f"{rel.item():.4f}")

    # state_dict round trip (reference-layout fields)
    clone = QuantLinear(bits=bits, group_size=gs, in_features=in_f,
                        out_features=out_f, bias=False, enable_tuning=False)
    clone.load_state_dict(ql.state_dict())
    clone.post_init()
    print("state_dict round-trip exact:",
          bool(torch.equal(ql(x), clone(x))))

    # -- BitNet b1.58 ----------------------------------------------------
    bl = BitLinearBitBLAS.from_bit_linear(torch.nn.Linear(1024, 1024))
    y = bl(torch.randn(4, 1024))
    print("BitLinearBitBLAS out:", tuple(y.shape), y.dtype)


if __name__ == "__main__":
    main()
