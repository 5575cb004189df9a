"""Headline benchmark: dequant-GEMM/GEMV % of roofline on the attached chip.

Sweeps W_UINT4 x A_FP16 (GPTQ-style grouped scaling) and W_INT2 x A_INT8
(BitNet) — the reference's headline regimes (README.md:13, BASELINE.md) —
over M in {1, 16, 256, 4096} at two shapes:

  * N=K=4096  — the synthetic square used since round 1 (kept unchanged;
    it is the measured WORST case: fixed overheads and the serial decode
    floor weigh heaviest here),
  * N=K=8192  — the llama-3-70B projection shape, matching the reference's
    own methodology of benchmarking real LLM shape sets
    (/root/reference/benchmark/README.md:44-77; docs/Benchmarks.md).

and prints ONE json line:

  {"metric": "dequant_gemm_pct_roofline_mean", "value": <mean %>,
   "unit": "%", "vs_baseline": <mean % / 80>}

vs_baseline is measured against the BASELINE.json target (>=80% of the
per-chip memory-bandwidth/MXU roofline for every W4A16/W2A8 kernel).

Set BITBLAS_TPU_BENCH_TUNE=1 to run the measured tuner per shape instead of
the curated hint table (slower first run; results persist in the hint DB).
BITBLAS_TPU_BENCH_SMALL=1 restricts to the 4096^2 section (quick runs).
BITBLAS_TPU_BENCH_BUDGET=<sec> caps total wall-clock (default 3000): past
60% of the budget candidate lists are trimmed, past 100% remaining rows
get a single candidate and the deferred re-measure passes are skipped.
"""

import json
import os
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from bitblas_tpu.kernels.dequant_matmul import make_dequant_matmul
    from bitblas_tpu.kernels.spec import KernelSpec
    from bitblas_tpu.ops.matmul_config import MatmulConfig
    from bitblas_tpu.ops.weight_transform import transform_reference_operands
    from bitblas_tpu.testing import random_reference_operands
    from bitblas_tpu.tuner import TileHint, enumerate_hints, get_arch, \
        roofline_seconds
    from bitblas_tpu.utils.timing import measure_kernel

    import time

    # ---- tunnel health gate, BEFORE any backend init -----------------------
    # The shared tunnel/compile service has multi-hour outage windows
    # (CLAUDE.md) and a dead tunnel wedges jax.devices() itself, so the gate
    # must run before get_arch(). Each probe is a subprocess (its own
    # timeout) that also reports the platform — on a CPU-only host the
    # first probe answers "healthy cpu" immediately and no gating applies.
    # One probe implementation for every gate (bench + chip queues):
    # scripts/health_wait.py. Subprocess-probed so a dead tunnel can never
    # wedge THIS process's backend.
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "scripts"))
    from health_wait import wait as _health_wait

    # Sticky tunnel-death flag: once a gate expires, stop touching the
    # chip everywhere (outer rows loop AND deferred passes) and salvage.
    tunnel_dead = [False]

    def health_gate(budget):
        if tunnel_dead[0]:
            return False
        if _health_wait(budget) == 0:
            return True
        tunnel_dead[0] = True
        return False

    def is_fatal(ex):
        # A worker crash/restart kills every live device buffer; the only
        # recovery is re-gate + rebuild operands (BENCH_r02.json post-
        # mortem: one device_put UNAVAILABLE destroyed the whole run).
        # Marker STRINGS only — matching exception type names like
        # XlaRuntimeError would reclassify deterministic per-candidate
        # compile failures (Mosaic INTERNAL, remote_compile 500) as crashes
        # and kill whole rows whose safe-fallback hint still works.
        s = str(ex)
        return any(k in s for k in (
            "UNAVAILABLE", "crashed", "restarted", "DEADLINE_EXCEEDED"))

    hbudget = float(os.environ.get("BITBLAS_TPU_BENCH_HEALTH_WAIT", 3600))
    if not health_gate(hbudget):
        # Do NOT attempt to measure against a dead tunnel: the first
        # remote compile would hang until the caller's timeout and any
        # number produced would be garbage. Exit loudly with no JSON
        # line — an absent measurement is honest; a zero or a stale
        # replay is not. (Observed 10h+ outages; CLAUDE.md.)
        log("bench: tunnel never became healthy after "
            f"{hbudget:.0f}s — refusing to emit numbers for a dead "
            "chip; re-run when the tunnel recovers")
        sys.exit(2)

    arch = get_arch()
    interpret = arch.is_cpu
    tune = bool(os.environ.get("BITBLAS_TPU_BENCH_TUNE"))
    budget = float(os.environ.get("BITBLAS_TPU_BENCH_BUDGET", 3000))
    t_start = time.monotonic()  # measurement budget starts post-gate

    def elapsed():
        return time.monotonic() - t_start

    # Curated hints: single source of truth in tuner/curated.py (the
    # sweep-measured winners; scripts/seed_curated_hints.py installs the
    # same table into the operator DB).
    from bitblas_tpu.tuner.curated import curated_hint

    def curated(m, w_dtype, nk=4096):
        a_dtype = "int8" if w_dtype == "int2" else "float16"
        return curated_hint(w_dtype, a_dtype, m, nk=nk)

    shapes = [4096, 8192]
    if os.environ.get("BITBLAS_TPU_BENCH_SMALL"):
        shapes = [4096]
    configs = []
    for nk in shapes:
        for m in (1, 16, 256, 4096):
            configs.append((m, MatmulConfig(
                M=m, N=nk, K=nk, A_dtype="float16", W_dtype="uint4",
                with_scaling=True, group_size=128, fast_decoding=False,
                out_dtype="float16")))
        for m in (1, 16, 256, 4096):
            configs.append((m, MatmulConfig(
                M=m, N=nk, K=nk, A_dtype="int8", W_dtype="int2",
                accum_dtype="int32", out_dtype="float32")))

    # Prefer tuned hints from the operator database (populated by
    # scripts/tune_bench_db.py or any prior hardware_aware_finetune).
    from bitblas_tpu.cache import global_operator_cache
    global_operator_cache.load_from_database()

    from bitblas_tpu.tuner.space import default_hint

    # ---- always-emit safety net (VERDICT r2 weak #1) -----------------------
    # Once measurement begins, the final JSON line MUST appear no matter
    # what fails mid-run: completed rows are checkpointed to a scratch
    # file as they land, and emit() runs on normal exit, on any uncaught
    # exception, and on SIGTERM (driver timeouts send TERM before KILL).
    rows = []
    n_total = len(configs)
    scratch = os.environ.get("BITBLAS_TPU_BENCH_SCRATCH",
                             "/tmp/bitblas_bench_rows.jsonl")
    emitted = [False]

    def emit():
        if emitted[0]:
            return
        if not rows:
            # Killed before any row was attempted (e.g. mid-health-gate):
            # stay silent — an absent measurement is honest, a recorded
            # value=0 for a dead tunnel is not.
            return
        emitted[0] = True
        done = [r for r in rows if r is not None and r.get("sec")]
        pcts = [100.0 * r["roof"] / r["sec"] for r in done]
        mean_pct = float(np.mean(pcts)) if pcts else 0.0
        print(json.dumps({
            "metric": "dequant_gemm_pct_roofline_mean",
            "value": round(mean_pct, 2),
            "unit": "%",
            "vs_baseline": round(mean_pct / 80.0, 4),
            "rows_completed": len(done),
            "rows_total": n_total,
        }), flush=True)

    import atexit
    import signal
    atexit.register(emit)

    def _on_term(signum, frame):
        emit()
        os._exit(3)

    try:
        signal.signal(signal.SIGTERM, _on_term)
    except (ValueError, OSError):
        pass  # non-main thread / restricted env

    # Fresh scratch per run: stale rows from a previous run (different
    # shape set / tunnel window) must never mix into a salvage.
    try:
        open(scratch, "w").close()
    except OSError:
        pass

    def checkpoint(row):
        try:
            with open(scratch, "a") as f:
                f.write(json.dumps({
                    k: (row[k] if k in ("m", "sec", "roof") else str(row[k]))
                    for k in ("m", "cfg", "hint", "sec", "roof")}) + "\n")
        except OSError:
            pass

    def rewrite_scratch():
        # deferred passes min-merge row["sec"] in place; re-dump so the
        # on-disk record matches what emit() reports
        try:
            open(scratch, "w").close()
            for r in rows:
                if r is not None and r.get("sec"):
                    checkpoint(r)
        except OSError:
            pass

    def measure_config(m, cfg):
        """Build operands on-device and measure one config; raises on a
        worker crash (caller re-gates + retries — device buffers made here
        never outlive one attempt)."""
        N, K = cfg.N, cfg.K
        spec = KernelSpec.from_config(cfg, m)
        ops = random_reference_operands(cfg, m, 0)
        dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
        args = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
        if cfg.with_scaling:
            args.append(jnp.asarray(dw.scales))

        # Safe fallback so a compile regression in a curated hint degrades
        # the number instead of silently dropping the config from the mean.
        safe = TileHint(block_m=256, block_n=1024, block_k=1024,
                        mma_dtype="bfloat16", decode_mode="telescope")
        hints = [curated(m, cfg.W_dtype, N), safe]
        if N != 4096 and hints[0] is None:
            # Unswept shape: the analytic default adapts its whole-K /
            # tall-block choices.
            hints.insert(1, default_hint(spec, arch))
        # asplit (float GEMV on the int8-MXU telescope) measured DEAD EVEN
        # at best on-chip (2026-08-19 tpu_asplit_probe: u4 m=1 18.0us vs
        # 18.4 curated — noise; m=16/256 worse). Not a bench candidate;
        # the kernel stays available to the tuner's enumerated space.
        if m >= 512:
            # Two-pass materialize plan (decode once -> vendor dense dot);
            # measured against the fused winners at large M.
            from bitblas_tpu.kernels.materialize import supports_materialize
            mat = TileHint(block_m=512, block_n=1024, block_k=1024,
                           mma_dtype=("int8" if cfg.A_dtype == "int8"
                                      else "bfloat16"),
                           decode_mode="materialize")
            if supports_materialize(spec, mat):
                hints.append(mat)
        cached_op = global_operator_cache.get(cfg)
        if cached_op is not None:
            hints.insert(0, cached_op.hint_for(m))
        if tune:
            hints = enumerate_hints(spec, arch)[:6] + [safe]
        # The DB is seeded from the same curated table — dedup so identical
        # hints are not measured twice (each costs ~20s in a slow window).
        seen, uniq = set(), []
        for h in hints:
            if h is None:
                continue
            key = h.short_name() + h.decode_mode + h.group_mode
            if key not in seen:
                seen.add(key)
                uniq.append(h)
        hints = uniq
        # Wall-clock self-protection: the driver runs this under an unknown
        # timeout — degrade coverage, never overrun.
        if elapsed() > budget:
            hints = hints[:1]
            log(f"bench: over budget ({elapsed():.0f}s) — single candidate")
        elif elapsed() > 0.6 * budget:
            hints = hints[:2]
            log(f"bench: past 60% budget ({elapsed():.0f}s) — trimmed to 2")

        wbits = cfg.bit
        abytes = 2 if cfg.A_dtype == "float16" else 1
        obytes = 2 if cfg.out_dtype == "float16" else 4
        wbytes = N * K * wbits // 8 + \
            (N * K // cfg.effective_group_size * 4 if cfg.with_scaling else 0)
        total = wbytes + m * K * abytes + m * N * obytes
        mxu = arch.flops_int8 if cfg.A_dtype == "int8" else arch.flops_bf16
        ingest = (arch.mxu_ingest_int8 if cfg.A_dtype == "int8"
                  else arch.mxu_ingest_bf16)
        t_bw = total / arch.hbm_bandwidth
        # Hardware envelope = max(HBM stream, MXU compute, MXU weight
        # ingestion at small M) — see BASELINE.md "roofline model" note and
        # scripts/tpu_ingest_probe.py for the measured ingestion rates.
        roof = max(t_bw, 2 * m * N * K / mxu, N * K / ingest)

        def build_fn(hint, spec=spec, cfg=cfg):
            # Default-arg binding: the deferred passes below call build_fn
            # AFTER the config loop finishes — late-bound spec/cfg would
            # silently rebuild every row with the LAST config.
            kf = make_dequant_matmul(spec, hint, interpret=interpret)
            if cfg.with_scaling:
                return lambda A, W, S, _kf=kf: _kf(A, W, scales=S)
            return lambda A, W, _kf=kf: _kf(A, W)

        def timing_kwargs(hint):
            # Transparent-XLA materialize plan: carry must ride the packed
            # weights and the full output must be consumed, else XLA hoists
            # the decode / slices the dot (kernels/materialize.py note).
            if hint.decode_mode == "materialize":
                return dict(inject=1, full_output_dep=True)
            if hint.decode_mode == "asplit":
                # carry rides A so the XLA quantize prologue stays in-loop
                return dict(inject=0)
            return {}

        def rebuild_args(cfg=cfg, m=m):
            # Deferred passes call this after a worker restart killed the
            # row's device buffers.
            ops = random_reference_operands(cfg, m, 0)
            dw = transform_reference_operands(cfg, ops.qweight, ops.scales)
            a = [jnp.asarray(ops.A), jnp.asarray(dw.qweight)]
            if cfg.with_scaling:
                a.append(jnp.asarray(dw.scales))
            return a

        best = None
        for hint in hints:
            try:
                fn = build_fn(hint)
                if interpret:
                    sec = roofline_seconds(spec, hint, arch)
                else:
                    # min-of-2 per candidate: a single hiccup must not
                    # mis-pick the winner (noise is one-sided slow).
                    sec = min(measure_kernel(fn, args, **timing_kwargs(hint))
                              for _ in range(2))
                if best is None or sec < best[0]:
                    best = (sec, hint)
            except Exception as ex:  # noqa: BLE001
                if is_fatal(ex):
                    # Worker restart killed every buffer this attempt made;
                    # raise to the row-retry loop (re-gate + full rebuild).
                    raise
                log(f"bench candidate failed: {hint.short_name()}: "
                    f"{str(ex)[:120]}")
        if best is None:
            # Keep the row retryable: the deferred passes below re-attempt
            # it minutes later (a transient outage must not zero a row).
            log(f"FAIL m={m} {cfg.W_dtype}x{cfg.A_dtype} — will retry in "
                f"deferred passes")
            return dict(m=m, cfg=cfg, hint=hints[0], build_fn=build_fn,
                        args=args, roof=roof, t_bw=t_bw, sec=None,
                        tkw=timing_kwargs(hints[0]), rebuild=rebuild_args)
        sec, hint = best
        if not interpret and elapsed() < budget:
            # Timing noise is one-sided (tunnel hiccups only ever slow a
            # run, never speed one up); re-measure the winner several times
            # and keep the min — the honest estimator of kernel latency.
            try:
                fn = build_fn(hint)
                for _ in range(3):
                    sec = min(sec, measure_kernel(fn, args,
                                                  **timing_kwargs(hint)))
            except Exception as ex:  # noqa: BLE001
                # The candidate-pass sec is already a valid completed
                # measurement — never discard it for a re-measure fault.
                if is_fatal(ex):
                    log(f"bench: worker fault during winner re-measure "
                        f"(m={m}): {str(ex)[:120]} — re-gating")
                    health_gate(hbudget)
        return dict(m=m, cfg=cfg, hint=hint, build_fn=build_fn,
                    args=args, roof=roof, t_bw=t_bw, sec=sec,
                    tkw=timing_kwargs(hint), rebuild=rebuild_args)

    for m, cfg in configs:
        if tunnel_dead[0]:
            rows.append(None)
            continue
        row = None
        for attempt in (0, 1, 2):
            try:
                row = measure_config(m, cfg)
                break
            except Exception as ex:  # noqa: BLE001
                log(f"bench: row m={m} {cfg.W_dtype}x{cfg.A_dtype} "
                    f"nk={cfg.N} attempt {attempt} died: {str(ex)[:160]}")
                if attempt < 2 and is_fatal(ex) and elapsed() < budget:
                    # Worker crash/restart: wait for the tunnel to answer
                    # again, then retry from scratch. A crash-LOOPING
                    # worker answers health probes instantly while still
                    # killing big jobs (2026-08-20 phase-E run lost six
                    # 8192 rows back-to-back), so the second retry also
                    # sleeps to ride out the loop. A failed gate sets
                    # tunnel_dead — every later row/pass skips straight
                    # to the salvage emit.
                    if not health_gate(hbudget):
                        log("bench: tunnel gone mid-run — salvaging "
                            "completed rows")
                        break
                    if attempt == 1:
                        log("bench: second worker crash on this row — "
                            "cooling down 120s before the final attempt")
                        time.sleep(120)
                else:
                    break
        rows.append(row)
        if row is not None and row["sec"] is not None:
            checkpoint(row)

    # Deferred re-measure passes: a degraded tunnel window during one row's
    # first-pass samples would otherwise poison that row for the whole run.
    # Sweeping all rows again minutes later min-merges across windows.
    if not interpret:
        for _ in range(2):
            if tunnel_dead[0]:
                break
            for row in rows:
                if tunnel_dead[0]:
                    break
                if row is None or elapsed() > budget:
                    continue
                try:
                    fn = row["build_fn"](row["hint"])
                    s = measure_kernel(fn, row["args"], **row["tkw"])
                    row["sec"] = s if row["sec"] is None \
                        else min(row["sec"], s)
                except Exception as ex:  # noqa: BLE001
                    if is_fatal(ex):
                        log(f"bench: worker fault in deferred pass: "
                            f"{str(ex)[:120]} — re-gating + rebuilding")
                        if not health_gate(hbudget):
                            break  # tunnel_dead set; outer loops exit too
                        try:
                            row["args"] = row["rebuild"]()
                        except Exception:  # noqa: BLE001
                            pass
        rewrite_scratch()

    for row in rows:
        if row is None or row["sec"] is None:
            log("FAIL row (never measured) — excluded from mean, visible "
                "in rows_completed")
            continue
        cfg, sec = row["cfg"], row["sec"]
        pct = 100.0 * row["roof"] / sec
        log(f"{cfg.W_dtype}x{cfg.A_dtype} nk={cfg.N:5d} m={row['m']:5d}: "
            f"{sec*1e6:8.1f}us "
            f"roof={row['roof']*1e6:7.1f}us (bw {row['t_bw']*1e6:6.1f}us) "
            f"pct={pct:5.1f}% ({row['hint'].short_name()})")

    emit()


if __name__ == "__main__":
    main()
