"""Lift a model's device arrays out of jit closures into arguments.

The axon remote-compile transport rejects computations whose closure
constants embed large weights (HTTP 413 / broken pipe somewhere between
~0.2 and ~1.4 GiB — observed on the 2026-08-20 MoE device-time bench;
CLAUDE.md "closure-constant limit"). jit ARGUMENTS travel as
device-resident buffers and never enter the compile request, so the fix
is to pass the weights as parameters.

Our models are plain Python objects whose ``decode_step``/``__call__``
read ``self``-attached ``jax.Array`` attributes (including tuples of
packed operands and dicts of per-projection weights). ``lift_arrays``
walks that object graph, harvests every device array, and returns
``(values, bind)``:

    values, bind = lift_arrays(model)
    def step(values, x, ...):
        bind(values)                  # writes tracers back in place
        return model.decode_step(x, ...)
    sec = measure_kernel(step, (values, x, ...))
    bind(values)                      # restore concrete arrays after trace

``bind`` mutates the SAME containers the model reads, so inside a traced
function the attributes hold tracers and the weights become function
inputs. After tracing, call ``bind(values)`` once more to put the
concrete arrays back (the trace leaves tracers behind).
"""

from __future__ import annotations

from typing import Any, Callable, List, Tuple

import jax


def lift_arrays(root: Any, max_depth: int = 12) -> Tuple[List[jax.Array],
                                                         Callable]:
    """Harvest every reachable jax.Array under `root`.

    Handles: object attributes (via __dict__), dict values, and
    tuple/list attribute values whose elements are arrays or None
    (packed-operand tuples). Lists of sub-objects are recursed.
    """
    sentinels = []   # (container_dict, key, meta); meta None = single
    leaves: List[jax.Array] = []
    seen = set()

    def try_emit(container: dict, key, val) -> bool:
        if isinstance(val, jax.Array):
            sentinels.append((container, key, None))
            leaves.append(val)
            return True
        if isinstance(val, (tuple, list)) and val and \
                any(isinstance(e, jax.Array) for e in val) and \
                all(isinstance(e, (jax.Array, type(None))) for e in val):
            idx = [i for i, e in enumerate(val)
                   if isinstance(e, jax.Array)]
            sentinels.append((container, key,
                              (type(val), list(val), idx)))
            leaves.extend(val[i] for i in idx)
            return True
        return False

    def walk(obj: Any, depth: int) -> None:
        if depth > max_depth or id(obj) in seen:
            return
        seen.add(id(obj))
        if isinstance(obj, dict):
            for k, v in list(obj.items()):
                if not try_emit(obj, k, v):
                    walk(v, depth + 1)
            return
        if isinstance(obj, (tuple, list)):
            for e in obj:
                walk(e, depth + 1)
            return
        d = getattr(obj, "__dict__", None)
        if d is not None:
            walk(d, depth + 1)

    walk(root, 0)

    n_expected = len(leaves)

    def bind(values) -> None:
        if len(values) != n_expected:
            raise ValueError(
                f"bind: expected {n_expected} values, got {len(values)}")
        i = 0
        for container, key, meta in sentinels:
            if meta is None:
                container[key] = values[i]
                i += 1
            else:
                typ, template, idx = meta
                items = list(template)
                for j in idx:
                    items[j] = values[i]
                    i += 1
                container[key] = typ(items)

    return leaves, bind


def jit_lifted(fn: Callable, owner: Any, donate_argnums=(), **jit_kw):
    """``jax.jit(fn)`` with every device array reachable from ``owner``
    passed as a hidden leading argument instead of a closure constant.

    Same call signature as ``fn``. ``donate_argnums`` refer to ``fn``'s
    own positional arguments (shifted internally past the lifted values).
    Weight arrays must not be replaced on ``owner`` after wrapping (the
    lifted values are captured once — the same staleness rule a jit
    closure has).

    Why: closure constants are serialized into the compile request; the
    axon remote-compile transport rejects bodies past ~256 MB (HTTP 413 /
    broken pipe), which made >2-layer llama and any Mixtral serving jit
    uncompilable on this rig. Arguments travel as device buffers.
    """
    import functools

    if "static_argnums" in jit_kw or "static_argnames" in jit_kw:
        raise NotImplementedError(
            "jit_lifted's inner wrapper is *args-based — static args "
            "would not map; jit those functions directly")
    vals, bind = lift_arrays(owner)
    if not vals:
        return jax.jit(fn, donate_argnums=tuple(donate_argnums), **jit_kw)
    shifted = tuple(a + 1 for a in donate_argnums)

    def inner(_lifted, *args, **kw):
        bind(_lifted)
        return fn(*args, **kw)

    jfn = jax.jit(inner, donate_argnums=shifted, **jit_kw)

    @functools.wraps(fn)
    def outer(*args, **kw):
        try:
            return jfn(vals, *args, **kw)
        finally:
            bind(vals)  # tracing leaves tracers on owner; restore

    return outer


__all__ = ["lift_arrays", "jit_lifted"]
