"""Device-side decode step at 8B scale (VERDICT r4 item 6).

Builds a FULL llama-8B-shaped QuantLlama (32 layers, 4096/14336, GQA 32/8,
uint4 + grouped scales ~= 3.5 GB resident) on the single chip and times
`decode_step` / `decode_step_quant` with the elision-proof chained timer,
weights riding as jit arguments (utils.lift — the closure-constant
transport limit is solved). This replaces the tunnel-taxed host-loop
numbers as the serving headline in docs/Serving.md; per-step device time
is what a local (untunneled) host would approach per engine step.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    from health_wait import wait as health_wait
    if health_wait(3600) != 0:
        log("tunnel dead — aborting")
        sys.exit(2)
    import jax
    import jax.numpy as jnp
    log("devices:", jax.devices())
    from bitblas_tpu.models.quant_llama import LlamaConfig, QuantLlama
    from bitblas_tpu.tuner import get_arch
    from bitblas_tpu.utils.lift import lift_arrays
    from bitblas_tpu.utils.timing import measure_kernel

    if get_arch().is_cpu:
        cfg = LlamaConfig(hidden_size=256, intermediate_size=512,
                          num_heads=4, num_kv_heads=2, num_layers=2,
                          vocab_size=128, group_size=128)
        layers_label = "cpu-smoke"
    else:
        cfg = LlamaConfig(hidden_size=4096, intermediate_size=14336,
                          num_heads=32, num_kv_heads=8, num_layers=32,
                          vocab_size=512, group_size=128)
        layers_label = "llama8b"
    t0 = time.monotonic()
    log(f"building {layers_label}: {cfg.num_layers} layers "
        f"{cfg.hidden_size}/{cfg.intermediate_size}...")
    model = QuantLlama(cfg, opt_m=(1, 8, 16))
    log(f"built in {time.monotonic()-t0:.0f}s; lifting weights...")
    vals, bind = lift_arrays(model)
    nbytes = sum(int(np.prod(v.shape)) * v.dtype.itemsize for v in vals)
    log(f"{len(vals)} arrays, {nbytes/2**30:.2f} GiB resident")
    emit(metric="model_resident_gib", value=round(nbytes / 2**30, 2),
         layers=cfg.num_layers, hidden=cfg.hidden_size)

    rng = np.random.default_rng(0)
    Lmax = 1024
    L = cfg.num_layers
    for bs in (1, 8, 16):
        for quant_kv in (False, True):
            try:
                x = jnp.asarray(rng.standard_normal(
                    (bs, 1, cfg.hidden_size)) * 0.02, jnp.float16)
                slots = jnp.arange(bs, dtype=jnp.int32)
                lengths = jnp.full((bs,), Lmax // 2, jnp.int32)
                if quant_kv:
                    ck = jnp.zeros((L, bs, Lmax, cfg.num_kv_heads,
                                    cfg.head_dim), jnp.int8)
                    cv = jnp.zeros_like(ck)
                    # unit scales: zero scales would make every logit
                    # equal (degenerate softmax); cost is identical but
                    # the measured graph should not be a constant-fold bait
                    sk = jnp.ones((L, bs, Lmax, cfg.num_kv_heads),
                                  jnp.float32)
                    sv = jnp.ones_like(sk)

                    def step(vals, x, ck, cv, sk, sv, slots, lengths):
                        bind(vals)
                        h, ck2, cv2, sk2, sv2 = model.decode_step_quant(
                            x, ck, cv, sk, sv, slots, lengths)
                        dep = (ck2[:, 0, 0, 0, 0].astype(jnp.float32).sum()
                               + cv2[:, 0, 0, 0, 0].astype(
                                   jnp.float32).sum()
                               + sk2[:, 0, 0, 0].sum()
                               + sv2[:, 0, 0, 0].sum())
                        return h + (dep * 0).astype(h.dtype)

                    args = (vals, x, ck, cv, sk, sv, slots, lengths)
                else:
                    ck = jnp.zeros((L, bs, Lmax, cfg.num_kv_heads,
                                    cfg.head_dim), jnp.float16)
                    cv = jnp.zeros_like(ck)

                    def step(vals, x, ck, cv, slots, lengths):
                        bind(vals)
                        h, ck2, cv2 = model.decode_step(x, ck, cv, slots,
                                                        lengths)
                        dep = (ck2[:, 0, 0, 0, 0].astype(jnp.float32).sum()
                               + cv2[:, 0, 0, 0, 0].astype(
                                   jnp.float32).sum())
                        return h + (dep * 0).astype(h.dtype)

                    args = (vals, x, ck, cv, slots, lengths)
                try:
                    sec = measure_kernel(step, args, inject=1)
                finally:
                    bind(vals)
                emit(metric="decode_step_device_8b", batch=bs,
                     kv_quant=quant_kv, value=round(sec * 1e6, 1),
                     unit="us", device_tok_s=round(bs / sec, 1),
                     per_layer_us=round(sec * 1e6 / L, 1))
            except Exception as ex:  # noqa: BLE001
                emit(metric="decode_step_device_8b", batch=bs,
                     kv_quant=quant_kv, error=str(ex)[:200])
                try:
                    bind(vals)
                except Exception:  # noqa: BLE001
                    pass


if __name__ == "__main__":
    main()
