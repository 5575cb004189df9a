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


class _AttrContainer:
    """dict-like setattr shim so ``bind`` can write __slots__ attributes
    through the same ``container[key] = value`` path as dict slots."""

    __slots__ = ("_obj",)

    def __init__(self, obj):
        self._obj = obj

    def __setitem__(self, key, val):
        setattr(self._obj, key, val)


def _has_slots(cls) -> bool:
    return any(getattr(k, "__slots__", ()) for k in cls.__mro__)


def lift_arrays(root: Any, max_depth: int = 24) -> Tuple[List[jax.Array],
                                                         Callable]:
    """Harvest every reachable jax.Array under `root`.

    Object attributes (via __dict__) and dict entries are *slots*. A
    slot whose value contains device arrays anywhere in its pytree
    (array, tuple/list/dict nesting — e.g. a MoE layer's
    ``Dict[str, List[tuple]]`` of packed expert operands) is lifted
    whole: the arrays become values, everything else in that pytree
    stays a constant template, and ``bind`` rebuilds the structure via
    ``tree_unflatten``. Slots with no arrays are recursed as sub-objects
    (lists of layers, nested modules, dicts of operator objects).

    Limitation: a pytree mixing arrays AND sub-objects in one slot lifts
    the arrays but leaves the sub-objects' own arrays as constants.
    """
    from jax import tree_util

    # (container_dict, key, treedef, template_flat, array_positions)
    sentinels = []
    leaves: List[jax.Array] = []
    seen = set()

    mixed_hits = [0]

    def handle_slot(container: dict, key, val, depth: int) -> None:
        flat, treedef = tree_util.tree_flatten(val)
        arr_pos = [i for i, l in enumerate(flat)
                   if isinstance(l, jax.Array)]
        if arr_pos:
            sentinels.append((container, key, treedef, flat, arr_pos))
            leaves.extend(flat[i] for i in arr_pos)
            # A slot mixing arrays with sub-objects lifts only the
            # direct arrays — the sub-objects' own weights would stay
            # closure constants, silently. Count and warn like the
            # depth cap.
            if any(not isinstance(l, jax.Array)
                   and (getattr(l, "__dict__", None)
                        or _has_slots(type(l))) for l in flat):
                mixed_hits[0] += 1
        else:
            walk(val, depth + 1)

    depth_hits = [0]

    def walk(obj: Any, depth: int) -> None:
        if depth > max_depth:
            # a silent cap would quietly leave deep weights as closure
            # constants — the exact failure this module exists to fix
            depth_hits[0] += 1
            return
        if id(obj) in seen:
            return
        seen.add(id(obj))
        if isinstance(obj, dict):
            for k, v in list(obj.items()):
                handle_slot(obj, k, v, depth)
            return
        if isinstance(obj, (tuple, list)):
            for e in obj:
                walk(e, depth + 1)
            return
        d = getattr(obj, "__dict__", None)
        if d is not None:
            walk(d, depth + 1)
        # __slots__ classes have no __dict__ (or a partial one) — their
        # attributes would otherwise be invisible and stay closure
        # constants, the exact failure this module exists to prevent.
        slot_names = set()
        for klass in type(obj).__mro__:
            s = getattr(klass, "__slots__", ())
            slot_names.update((s,) if isinstance(s, str) else s)
        for name in slot_names:
            if name in ("__dict__", "__weakref__"):
                continue
            try:
                val = getattr(obj, name)
            except AttributeError:
                continue
            handle_slot(_AttrContainer(obj), name, val, depth)

    walk(root, 0)
    if depth_hits[0]:
        from ..common import get_logger
        get_logger().warning(
            "lift_arrays: object graph exceeded max_depth=%d at %d "
            "branches — arrays below the cap stay closure constants "
            "(raise max_depth if compile requests are still oversized)",
            max_depth, depth_hits[0])
    if mixed_hits[0]:
        from ..common import get_logger
        get_logger().warning(
            "lift_arrays: %d slot(s) mix arrays with sub-objects — the "
            "sub-objects' own arrays stay closure constants",
            mixed_hits[0])

    n_expected = len(leaves)

    def bind(values) -> None:
        if len(values) != n_expected:
            raise ValueError(
                f"bind: expected {n_expected} values, got {len(values)}")
        from jax import tree_util
        i = 0
        for container, key, treedef, template, arr_pos in sentinels:
            flat = list(template)
            for p in arr_pos:
                flat[p] = values[i]
                i += 1
            container[key] = tree_util.tree_unflatten(treedef, flat)

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

    traced = [False]

    def inner(_lifted, *args, **kw):
        traced[0] = True  # Python body runs only while tracing
        # Retrace = the one moment the Python body runs again. Detect the
        # documented staleness hazard (weights replaced on `owner` after
        # wrapping → the cached wrapper keeps computing with the captured
        # arrays) and warn loudly. Owner still holds concrete arrays here
        # (bind below is what installs the tracers).
        cur, _ = lift_arrays(owner)
        if len(cur) != len(vals) or any(
                a is not b for a, b in zip(cur, vals)):
            from ..common import get_logger
            get_logger().warning(
                "jit_lifted: arrays reachable from the wrapped model "
                "changed after wrapping (%d captured vs %d current, "
                "identity mismatch) — this wrapper still computes with "
                "the ORIGINAL weights; re-wrap after replacing weights",
                len(vals), len(cur))
        bind(_lifted)
        return fn(*args, **kw)

    jfn = jax.jit(inner, donate_argnums=shifted, **jit_kw)

    @functools.wraps(fn)
    def outer(*args, **kw):
        traced[0] = False
        try:
            return jfn(vals, *args, **kw)
        finally:
            if traced[0]:
                bind(vals)  # tracing left tracers on owner; restore

    return outer


__all__ = ["lift_arrays", "jit_lifted"]
