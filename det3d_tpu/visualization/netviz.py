"""Network graph visualization for flax detectors.

Parity: det3d/visualization/netviz.py (graphviz rendering of the model
graph). The torch version walks autograd; the functional analogue walks
the params pytree — every flax submodule is a subtree — and emits a
graphviz dot of the module hierarchy annotated with parameter shapes and
counts. ``render=False`` (default) returns dot source so the tool works
without the graphviz binary; the python ``graphviz`` package is optional.
"""

from __future__ import annotations

from typing import Any, Dict


def _count(tree) -> int:
    import jax
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))


def _is_param_leaf(v) -> bool:
    return hasattr(v, "shape") and hasattr(v, "dtype")


def module_graph(params: Dict[str, Any], name: str = "model"):
    """params pytree -> (nodes, edges): nodes are (path, label) with
    parameter counts; edges parent->child."""
    nodes = [("", f"{name}\\n{_count(params):,} params")]
    edges = []

    def walk(prefix, tree):
        for k, v in tree.items():
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict) and not all(_is_param_leaf(x)
                                               for x in v.values()):
                nodes.append((path, f"{k}\\n{_count(v):,}"))
                edges.append((prefix, path))
                walk(path, v)
            else:
                shapes = ", ".join(
                    f"{n}{tuple(x.shape)}" for n, x in v.items()
                ) if isinstance(v, dict) else f"{tuple(v.shape)}"
                nodes.append((path, f"{k}\\n{shapes}"))
                edges.append((prefix, path))

    walk("", params)
    return nodes, edges


def to_dot(params: Dict[str, Any], name: str = "model") -> str:
    """Graphviz dot source of the module hierarchy."""
    nodes, edges = module_graph(params, name)
    out = [f'digraph "{name}" {{',
           '  rankdir=TB; node [shape=box, fontsize=10, '
           'style="rounded,filled", fillcolor="#eef3fb"];']
    for path, label in nodes:
        out.append(f'  "{path or name}" [label="{label}"];')
    for a, b in edges:
        out.append(f'  "{a or name}" -> "{b}";')
    out.append("}")
    return "\n".join(out)


def render(params: Dict[str, Any], path: str, name: str = "model",
           fmt: str = "png"):
    """Write dot source to <path>.dot and, when the graphviz package +
    binary are present, render to <path>.<fmt>. Returns the written
    paths."""
    from pathlib import Path
    src = to_dot(params, name)
    dot_path = Path(str(path) + ".dot")
    dot_path.write_text(src)
    written = [str(dot_path)]
    try:                                               # pragma: no cover
        import graphviz
        g = graphviz.Source(src)
        written.append(g.render(filename=str(path), format=fmt,
                                cleanup=True))
    except Exception:
        pass
    return written


def summarize(params: Dict[str, Any]) -> str:
    """Text table of top-level submodules and their parameter counts
    (the quick-look the reference prints alongside the graph)."""
    rows = [(k, _count(v)) for k, v in params.items()]
    total = sum(c for _, c in rows) or 1
    width = max((len(k) for k, _ in rows), default=4)
    lines = [f"{'module':<{width}}  {'params':>12}  share"]
    for k, c in sorted(rows, key=lambda r: -r[1]):
        lines.append(f"{k:<{width}}  {c:>12,}  {100.0 * c / total:5.1f}%")
    lines.append(f"{'total':<{width}}  {total:>12,}")
    return "\n".join(lines)
