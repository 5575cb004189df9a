"""BitNet b1.58 QAT training example (STE fake-quant, runs on CPU or TPU).

Shows the round trip the reference's BitNet integration implies:
train with fake-quant STE -> ternarize + pack -> serve on the integer-exact
W_INT2 x A_INT8 fused kernel, with matching outputs.

Usage: PYTHONPATH=.:$PYTHONPATH python examples/bitnet_qat_training.py
"""

# --cpu: run on the host CPU (8 virtual devices) instead of the TPU —
# the axon plugin ignores JAX_PLATFORMS, so this must be set in-process
# before the first jax use (CLAUDE.md environment note).
import sys as _sys
if "--cpu" in _sys.argv:
    _sys.argv.remove("--cpu")
    import os as _os
    _os.environ.setdefault("XLA_FLAGS",
                           "--xla_force_host_platform_device_count=8")
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from bitblas_tpu.models.bitnet import (BitLinearInference,
                                       bitlinear_train_forward)


def main():
    rng = np.random.default_rng(0)
    H, F, B = 256, 512, 32
    params = {
        "w1": jnp.asarray(rng.standard_normal((F, H)).astype(np.float32) * 0.1),
        "w2": jnp.asarray(rng.standard_normal((H, F)).astype(np.float32) * 0.1),
    }
    x = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((B, H)).astype(np.float32))

    def loss_fn(p):
        h = jax.nn.relu(bitlinear_train_forward(x, p["w1"]))
        out = bitlinear_train_forward(h, p["w2"])
        return jnp.mean((out - y) ** 2)

    @jax.jit
    def step(p):
        l, g = jax.value_and_grad(loss_fn)(p)
        return jax.tree.map(lambda a, b: a - 0.05 * b, p, g), l

    for i in range(50):
        params, l = step(params)
        if i % 10 == 0:
            print(f"step {i:3d} loss {float(l):.4f}")

    # Deploy: ternarize the trained master weights onto the fused kernel.
    l1 = BitLinearInference.from_weight(np.asarray(params["w1"]), opt_m=(B,))
    l2 = BitLinearInference.from_weight(np.asarray(params["w2"]), opt_m=(B,))
    h = jax.nn.relu(l1(x))
    served = l2(h)

    # Fake-quant forward with the same (frozen) weights for comparison.
    ref_h = jax.nn.relu(bitlinear_train_forward(x, params["w1"]))
    ref = bitlinear_train_forward(ref_h, params["w2"])
    err = float(jnp.abs(served - ref).max())
    print(f"serve-vs-fakequant max abs diff: {err:.2e} "
          f"(kernel path is integer-exact; the fake-quant reference matmul "
          f"itself runs at bf16 precision on TPU)")


if __name__ == "__main__":
    main()
