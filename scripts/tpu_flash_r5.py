"""r5 flash campaign (VERDICT r4 item 5):

1. Second-window confirmation of the causal s2048 diag_sub headline —
   diag_sub in {0, 512, 256} head-to-head IN ONE WINDOW at the tuned
   blocks (the r3 82.4 TF/s number rests on a single window).
2. Coverage widening: s8192, and head_dim in {64, 256}, causal + dense,
   via hardware_aware_finetune; winners persisted to the hint DB.
"""
import logging
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bitblas_tpu import set_log_level
from bitblas_tpu.kernels.flash import make_flash_attention
from bitblas_tpu.ops.flashatten import FlashAtten, FlashAttenConfig
from bitblas_tpu.utils.timing import measure_kernel

set_log_level(logging.INFO)


def main():
    from health_wait import wait as health_wait
    if health_wait(3600) != 0:
        print("tunnel dead — aborting", flush=True)
        sys.exit(2)
    import jax
    print("devices:", jax.devices(), flush=True)
    only = os.environ.get("BITBLAS_TPU_FLASH_R5_ONLY", "")

    # --- 1. one-window diag_sub head-to-head at s2048 (tuned blocks) ---
    b, h, s, d = 4, 32, 2048, 128
    rng = np.random.default_rng(0)
    import jax.numpy as jnp
    # layouts: Q/K/V are [B, S, H, D] (flash.py nnn convention)
    Q = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float16)
    K = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float16)
    V = jnp.asarray(rng.standard_normal((b, s, h, d)), jnp.float16)
    flops = 4 * b * h * s * s * d * 0.5
    for bq, bkv in ((1024, 1024), (512, 512)) if only in ("", "diag") \
            else ():
        for sub in (0, 512, 256):
            if sub and (bq % sub or bq // sub < 2):
                continue
            try:
                fn = make_flash_attention(
                    batch=b, heads=h, seq_len=s, dim=d, causal=True,
                    block_q=bq, block_kv=bkv, diag_sub=sub)
                sec = min(measure_kernel(fn, (Q, K, V)) for _ in range(2))
                print(f"s2048 bq{bq} bkv{bkv} diag={sub:4d}: "
                      f"{sec*1e6:8.1f}us {flops/sec/1e12:6.1f} TF/s",
                      flush=True)
            except Exception as ex:  # noqa: BLE001
                print(f"s2048 bq{bq} diag={sub}: FAIL {str(ex)[:100]}",
                      flush=True)

    # --- 1b. windowed flash-decode on-chip check (sliding-window serving;
    # interpret-mode parity exists, this is the Mosaic-lowering smoke) ---
    from bitblas_tpu.serving.kv_cache import decode_attention
    rng2 = np.random.default_rng(3)
    B, rows, L, Hkv, H, D = 4, 6, 2048, 2, 4, 128
    ck = jnp.asarray(rng2.standard_normal((rows, L, Hkv, D)), jnp.float32)
    cv = jnp.asarray(rng2.standard_normal((rows, L, Hkv, D)), jnp.float32)
    qd = jnp.asarray(rng2.standard_normal((B, H, D)), jnp.float16)
    slots = jnp.asarray([0, 2, 3, 5], jnp.int32)
    lengths = jnp.asarray([37, 700, 1025, 2048], jnp.int32)
    for window in (None, 600) if only in ("", "decode") else ():
        try:
            a = decode_attention(qd, ck, cv, slots, lengths, num_heads=H,
                                 use_flash=True, window=window)
            bref = decode_attention(qd, ck, cv, slots, lengths,
                                    num_heads=H, use_flash=False,
                                    window=window)
            err = np.abs(np.asarray(a, np.float32)
                         - np.asarray(bref, np.float32)).max()
            print(f"flash-decode window={window}: max abs {err:.4f} "
                  f"{'OK' if err < 0.05 else 'WRONG'}", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"flash-decode window={window}: FAIL {str(ex)[:120]}",
                  flush=True)

    # --- 1c. banded (sliding-window) prefill: Mosaic smoke + the band
    # speedup claim (O(S*W) walk vs the full triangular walk) ---
    # (no local re-import here: a function-local `from ... import
    # make_flash_attention` would shadow the module-level name for the
    # WHOLE function body and broke section 1 in the r5e window)
    bw_b, bw_h, bw_s, bw_d = 1, 16, 8192, 128
    Qw = jnp.asarray(rng.standard_normal((bw_b, bw_s, bw_h, bw_d)),
                     jnp.float16)
    Kw = jnp.asarray(rng.standard_normal((bw_b, bw_s, bw_h, bw_d)),
                     jnp.float16)
    Vw = jnp.asarray(rng.standard_normal((bw_b, bw_s, bw_h, bw_d)),
                     jnp.float16)
    for win in (None, 2048, 1024) if only in ("", "banded") else ():
        try:
            fw = make_flash_attention(
                batch=bw_b, heads=bw_h, seq_len=bw_s, dim=bw_d,
                causal=True, block_q=1024, block_kv=1024, window=win)
            sec = min(measure_kernel(fw, (Qw, Kw, Vw)) for _ in range(2))
            fl = 4 * bw_b * bw_h * bw_s * bw_d * (
                win if win else bw_s * 0.5)
            print(f"banded s8192 w={win}: {sec*1e6:8.1f}us "
                  f"({fl/sec/1e12:5.1f} TF/s useful)", flush=True)
            if win == 1024:
                # correctness vs masked-XLA on chip (small slice compare)
                import jax as _jax
                out = fw(Qw, Kw, Vw)
                s0 = np.asarray(out[0, 4096:4100, 0, :4], np.float32)
                qs = Qw[:, :, :, :].astype(jnp.float32)
                ks = Kw.astype(jnp.float32)
                vs2 = Vw.astype(jnp.float32)
                sc = jnp.einsum("bqhd,bkhd->bhqk", qs[:, 4096:4100],
                                ks) / np.sqrt(bw_d)
                kj = jnp.arange(bw_s)[None, None, None, :]
                qi = (4096 + jnp.arange(4))[None, None, :, None]
                keep = (qi >= kj) & (kj > qi - win)
                sc = jnp.where(keep, sc, -1e30)
                pw = _jax.nn.softmax(sc, axis=-1)
                ref = jnp.einsum("bhqk,bkhd->bqhd", pw, vs2)
                err = float(np.max(np.abs(
                    s0 - np.asarray(ref[0, :, 0, :4], np.float32))))
                print(f"banded w=1024 parity: max abs {err:.4f} "
                      f"{'OK' if err < 0.05 else 'WRONG'}", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"banded s8192 w={win}: FAIL {str(ex)[:140]}",
                  flush=True)

    # --- 1d. d=64 zero-pad shim vs the XLA fallback (r5e measured the
    # fallback at 7.5/14.9 TF/s causal/dense on b4 h32 s2048 d64) ---
    if only in ("", "pad64"):
        pb, ph, ps, pd = 4, 32, 2048, 64
        Qp = jnp.asarray(rng.standard_normal((pb, ps, ph, pd)), jnp.float16)
        Kp = jnp.asarray(rng.standard_normal((pb, ps, ph, pd)), jnp.float16)
        Vp = jnp.asarray(rng.standard_normal((pb, ps, ph, pd)), jnp.float16)
        for causal in (True, False):
            try:
                fp = make_flash_attention(
                    batch=pb, heads=ph, seq_len=ps, dim=pd, causal=causal,
                    block_q=1024, block_kv=1024)
                sec = min(measure_kernel(fp, (Qp, Kp, Vp)) for _ in range(2))
                fl = 4 * pb * ph * ps * ps * pd * (0.5 if causal else 1.0)
                # parity vs the XLA softmax at the true 1/sqrt(64) scale
                import jax.nn as jnn
                s_ = jnp.einsum("bqhd,bkhd->bhqk", Qp.astype(jnp.float32),
                                Kp.astype(jnp.float32)) / np.sqrt(pd)
                if causal:
                    s_ = jnp.where(jnp.tril(jnp.ones((ps, ps), bool))[
                        None, None], s_, -1e30)
                exp_ = jnp.einsum("bhqk,bkhd->bqhd", jnn.softmax(s_, -1),
                                  Vp.astype(jnp.float32))
                err = np.abs(np.asarray(fp(Qp, Kp, Vp), np.float32)
                             - np.asarray(exp_, np.float32)).max()
                print(f"pad64 causal={causal}: {sec*1e6:8.1f}us "
                      f"{fl/sec/1e12:6.1f} TF/s useful maxerr={err:.1e}",
                      flush=True)
            except Exception as ex:  # noqa: BLE001
                print(f"pad64 causal={causal}: FAIL {str(ex)[:140]}",
                      flush=True)

    # --- 2. new shapes: s8192 + head_dim 64/256 ---
    if only not in ("", "shapes"):
        return
    for (bb, hh, ss, dd, causal) in [(1, 16, 8192, 128, True),
                                     (1, 16, 8192, 128, False),
                                     (4, 32, 2048, 64, True),
                                     (4, 32, 2048, 64, False),
                                     (4, 16, 2048, 256, True),
                                     (4, 16, 2048, 256, False)]:
        try:
            cfg = FlashAttenConfig(batch=bb, heads=hh, seq_len=ss, dim=dd,
                                   is_causal=causal)
            op = FlashAtten(cfg, enable_tuning=False)
            Qx, Kx, Vx = op._example_args()
            out = op.forward(Qx, Kx, Vx)
            exp = op.ref_program(Qx, Kx, Vx)
            err = np.abs(np.asarray(out, np.float32)
                         - np.asarray(exp, np.float32)).max()
            best = op.hardware_aware_finetune()
            sec = measure_kernel(op._fn, (Qx, Kx, Vx), inject=0)
            fl = 4 * bb * hh * ss * ss * dd * (0.5 if causal else 1.0)
            print(f"b{bb} h{hh} s{ss} d{dd} causal={causal}: "
                  f"best={best[0]} {sec*1e6:8.1f}us {fl/sec/1e12:6.1f} "
                  f"TF/s maxerr={err:.3e}", flush=True)
            if best[0] is not None:
                from bitblas_tpu.cache import global_operator_cache
                global_operator_cache.add(cfg, op)
                global_operator_cache.save_into_database()
                print(f"  persisted bq={op.block_q} bkv={op.block_kv}",
                      flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"b{bb} h{hh} s{ss} d{dd} causal={causal}: FAIL "
                  f"{str(ex)[:140]}", flush=True)


if __name__ == "__main__":
    main()
