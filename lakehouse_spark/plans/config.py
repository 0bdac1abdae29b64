"""Config-compilation plane (SURVEY.md §2.6 O8, §2.8 T15/T16, §2.7 D2).

The reference compiles profiles into mount plans: behaviors are
topologically sorted by dependency, their configs deep-merged in dependency
order, prefix-keyed overlays exploded onto components, and tools/hooks
deduped first-wins in encounter order
(profile_compilation.py:65-767 — read, not copied).

Deliberately driver-side plain Python: this is CONFIG compilation, not data
processing — inputs are tens of documents, not tables (SURVEY.md §7 phase
7). Kept inside the engine package because query pipelines call it to
resolve their runtime configuration, and its outputs (mount plans) feed the
schemas in :mod:`lakehouse_spark.schemas`.
"""

from __future__ import annotations

from typing import Any, Hashable, Iterable, Mapping, Sequence


class DependencyCycleError(ValueError):
    """Raised when the behavior graph has no topological order."""


def toposort(
    nodes: Iterable[Hashable],
    edges: Mapping[Hashable, Sequence[Hashable]],
) -> list[Hashable]:
    """O8 ← profile_compilation.py:297-368: Kahn's algorithm over
    (node → its dependencies); dependencies order before dependents, ties
    broken by input encounter order (deterministic, like the reference's
    insertion-ordered queue). Unknown dependencies are ignored; a cycle
    raises :class:`DependencyCycleError` naming the stuck nodes."""
    order = list(nodes)
    known = set(order)
    deps = {n: [d for d in edges.get(n, ()) if d in known] for n in order}
    out: list[Hashable] = []
    ready = [n for n in order if not deps[n]]
    done: set[Hashable] = set()
    while ready:
        n = ready.pop(0)
        out.append(n)
        done.add(n)
        for m in order:
            if m not in done and m not in ready and all(d in done for d in deps[m]):
                ready.append(m)
    if len(out) != len(order):
        stuck = [n for n in order if n not in done]
        raise DependencyCycleError(f"dependency cycle among: {stuck}")
    return out


def deep_merge(base: Mapping[str, Any], overlay: Mapping[str, Any]) -> dict:
    """T15 ← profile_compilation.py:511-554: recursive dict merge — dicts
    merge key-by-key, lists and scalars REPLACE (later wins). Inputs are not
    mutated."""
    out: dict = dict(base)
    for k, v in overlay.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def merge_in_order(configs: Sequence[Mapping[str, Any]]) -> dict:
    """T15 applied over a dependency-ordered sequence (earlier = lower
    precedence, exactly the compile pipeline's fold)."""
    out: dict = {}
    for c in configs:
        out = deep_merge(out, c)
    return out


def prefix_overlay(
    config: Mapping[str, Any], component_id: str, extra_prefixes: Sequence[str] = ()
) -> dict:
    """T16 ← profile_compilation.py:685-687,717-720: extract the keys
    addressed to one component — '{component_id}.{k}' (plus any
    ``extra_prefixes``, e.g. 'hook.{id}') — stripped of their prefix."""
    prefixes = [f"{component_id}."] + [f"{p}." for p in extra_prefixes]
    out: dict = {}
    for key, v in config.items():
        for p in prefixes:
            if key.startswith(p):
                out[key[len(p):]] = v
                break
    return out


def first_wins(items: Iterable[Mapping[str, Any]], key: str) -> list[dict]:
    """D2 ← profile_compilation.py:660-725: order-preserving first-wins
    dedup of component lists (the seen_tools/seen_hooks sets). The
    DataFrame-shaped equivalent is operators.dedup.first_wins over an
    explicit encounter_seq."""
    seen: set = set()
    out: list[dict] = []
    for it in items:
        k = it.get(key)
        if k in seen:
            continue
        seen.add(k)
        out.append(dict(it))
    return out


def compile_mount_plan(
    behaviors: Mapping[str, Mapping[str, Any]],
    dependencies: Mapping[str, Sequence[str]],
) -> dict:
    """The 8-stage pipeline's config core, end-to-end: toposort behaviors,
    merge their configs in dependency order, first-wins dedup their tool and
    hook lists, and attach per-component overlays."""
    order = toposort(list(behaviors), dependencies)
    merged = merge_in_order([behaviors[b].get("config", {}) for b in order])
    tools = first_wins(
        (t for b in order for t in behaviors[b].get("tools", ())), "id"
    )
    hooks = first_wins(
        (h for b in order for h in behaviors[b].get("hooks", ())), "id"
    )
    for t in tools:
        t["config"] = prefix_overlay(merged, t["id"])
    for h in hooks:
        h["config"] = prefix_overlay(merged, h["id"], [f"hook.{h['id']}"])
    return {"order": order, "config": merged, "tools": tools, "hooks": hooks}
