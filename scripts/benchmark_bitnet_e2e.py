"""BitNet b1.58-3B end-to-end decode benchmark.

TPU counterpart of the reference's headline e2e numbers
(/root/reference/integration/BitNet/README.md:49-61: 64.18 ms bs1 on A100,
1,729 MB footprint). Builds the 3B geometry (hidden 3200, ffn 8640, 26
layers) with ternarized W_INT2 x A_INT8 fused matmuls and measures per-token
decode latency + weight memory.

Usage: PYTHONPATH=.:$PYTHONPATH python scripts/benchmark_bitnet_e2e.py [--layers N]
"""

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=26)
    ap.add_argument("--measure-layers", type=int, default=4,
                    help="layers actually timed (the 26-layer chained "
                         "graph overloads the remote Mosaic compiler); "
                         "per-layer cost x --layers is reported")
    ap.add_argument("--hidden", type=int, default=3200)
    ap.add_argument("--ffn", type=int, default=8640)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--batch", type=int, nargs="*", default=[1, 16])
    args = ap.parse_args()

    from bitblas_tpu.models import BitNetLlama, LlamaConfig
    from bitblas_tpu.utils.timing import measure_kernel

    # BitNet-3B geometry; ffn rounded to a 128-multiple for lane alignment.
    ffn = (args.ffn // 256) * 256
    ml = min(args.measure_layers, args.layers)
    cfg = LlamaConfig(hidden_size=args.hidden, intermediate_size=ffn,
                      num_heads=args.heads, num_kv_heads=args.heads,
                      num_layers=ml)
    print(f"building BitNet {ml}L (of {args.layers}) hidden={args.hidden} "
          f"ffn={ffn}...", file=sys.stderr)
    t0 = time.perf_counter()
    model = BitNetLlama(cfg, opt_m=(1, 16))
    print(f"built in {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    # weight memory: int2 packed + scales, scaled to the full depth
    wbytes = 0
    for layer in model.layers:
        for p in layer.projs.values():
            wbytes += int(np.prod(p.qweight.shape))
    wbytes = wbytes * args.layers // ml
    print(f"packed weight footprint ({args.layers}L): {wbytes/2**20:.0f} MiB "
          f"(fp16 equivalent would be {wbytes*8/2**20:.0f} MiB)")

    for bs in args.batch:
        x = jnp.asarray(np.random.default_rng(0).standard_normal(
            (bs, 1, cfg.hidden_size)).astype(np.float16))
        pos = jnp.zeros((bs, 1), jnp.int32)
        fn = lambda a, p: model(a, p)
        sec = measure_kernel(fn, (x, pos), inject=0, full_output_dep=True)
        full = sec * args.layers / ml
        print(f"bs={bs:4d} seq=1 decode step: {full*1e3:7.2f} ms "
              f"({bs/full:.0f} tok/s) [measured {ml}L: {sec*1e3:.2f} ms]")


if __name__ == "__main__":
    main()
