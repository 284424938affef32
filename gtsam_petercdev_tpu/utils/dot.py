"""Graphviz export of factor graphs (reference: gtsam/inference/DotWriter.h
and nonlinear/GraphvizFormatting.h). Variables are ellipses labeled with
their Symbol; factors are black dots connected to their keys."""

from __future__ import annotations

from typing import Optional

from gtsam_petercdev_tpu.core import keys as keymod


def graph_to_dot(graph, values=None, title: Optional[str] = None) -> str:
    """Render a NonlinearFactorGraph as a graphviz dot string."""
    graph._materialize()
    lines = ["graph {", "  size=\"10,10\";"]
    if title:
        lines.append(f'  label="{title}";')
    seen = set()
    fid = 0
    for batch in graph.batches:
        for i in range(batch.size):
            fname = f"factor{fid}"
            fid += 1
            lines.append(f'  {fname}[label="", shape=point];')
            for k in batch.keys[i]:
                k = int(k)
                vname = f"var{k}"
                if k not in seen:
                    seen.add(k)
                    label = keymod.key_to_str(k)
                    lines.append(f'  {vname}[label="{label}"];')
                lines.append(f"  {vname}--{fname};")
    lines.append("}")
    return "\n".join(lines)


def write_dot(graph, path: str, values=None, title=None):
    with open(path, "w") as f:
        f.write(graph_to_dot(graph, values, title))
