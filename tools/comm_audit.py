"""Collective-traffic audit: count per-device wire bytes of every
collective in a jitted function, by walking its jaxpr.

Used to validate the id-redistribution cost model (NOTES_r2.md): the
all_gather-of-ids input dist vs the routed a2a variant, and the planner's
ICI/DCN estimates, without hardware counters.

Wire-bytes accounting per device (ring algorithms):
  all_gather:     receives (g-1) x operand bytes
  all_to_all:     sends/receives (g-1)/g x operand bytes
  reduce_scatter: (g-1)/g x operand bytes   (psum_scatter)
  psum:           2 (g-1)/g x operand bytes (reduce-scatter + all-gather)
  ppermute:       operand bytes

`axis_index_groups` splits the mesh axis into groups of size g; entries
are reported per distinct group size so intra-host (ICI) and cross-host
(DCN) legs of hierarchical shardings can be separated.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import numpy as np

_COLLECTIVES = {
    "all_gather",
    "all_to_all",
    "psum",
    "psum2",
    "reduce_scatter",
    "psum_scatter",
    "ppermute",
}


@dataclasses.dataclass
class CollectiveStat:
    primitive: str
    operand_bytes: int
    group_size: int
    wire_bytes: int
    count: int = 1


def _operand_bytes(eqn) -> int:
    return int(
        sum(
            np.prod(v.aval.shape) * v.aval.dtype.itemsize
            for v in eqn.invars
            if hasattr(v.aval, "shape") and hasattr(v.aval, "dtype")
        )
    )


def _group_size(eqn, axis_sizes: Dict[str, int]) -> int:
    params = eqn.params
    groups = params.get("axis_index_groups")
    if groups:
        return len(groups[0])
    axes = params.get("axis_name", params.get("axes", ()))
    if not isinstance(axes, (tuple, list)):
        axes = (axes,)
    g = 1
    for a in axes:
        g *= axis_sizes.get(a, 1)
    return g


def _wire_bytes(prim: str, operand: int, g: int) -> int:
    if g <= 1:
        return 0
    if prim == "all_gather":
        return operand * (g - 1)
    if prim == "all_to_all":
        return operand * (g - 1) // g
    if prim in ("reduce_scatter", "psum_scatter"):
        return operand * (g - 1) // g
    if prim in ("psum", "psum2"):
        return 2 * operand * (g - 1) // g
    if prim == "ppermute":
        return operand
    return 0


def _walk(jaxpr, axis_sizes: Dict[str, int], out: List[CollectiveStat]):
    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        if name in _COLLECTIVES:
            operand = _operand_bytes(eqn)
            g = _group_size(eqn, axis_sizes)
            out.append(
                CollectiveStat(
                    primitive=name,
                    operand_bytes=operand,
                    group_size=g,
                    wire_bytes=_wire_bytes(name, operand, g),
                )
            )
        # recurse into sub-jaxprs (pjit / shard_map / scan / cond ...)
        sub_sizes = dict(axis_sizes)
        if name == "shard_map":
            mesh = eqn.params.get("mesh")
            if mesh is not None:
                for a, s in zip(mesh.axis_names, mesh.devices.shape
                                if hasattr(mesh, "devices") else ()):
                    sub_sizes[a] = int(s)
                try:
                    sub_sizes.update(
                        {a: int(s) for a, s in mesh.shape.items()}
                    )
                except Exception:  # noqa: BLE001
                    pass
        for param in eqn.params.values():
            for j in _sub_jaxprs(param):
                _walk(j, sub_sizes, out)
    return out


def _sub_jaxprs(param: Any):
    from jax.extend.core import Jaxpr  # jaxpr type home (jax>=0.4.30)

    if isinstance(param, Jaxpr):
        yield param
    elif hasattr(param, "jaxpr"):  # ClosedJaxpr
        yield param.jaxpr
    elif isinstance(param, (tuple, list)):
        for p in param:
            yield from _sub_jaxprs(p)


def audit(fn, *args, **kwargs) -> List[CollectiveStat]:
    """Trace fn(*args) and return its collectives with wire bytes."""
    closed = jax.make_jaxpr(fn, **kwargs)(*args)
    return _walk(closed.jaxpr, {}, [])


def total_wire_bytes(
    stats: List[CollectiveStat],
    primitive: Optional[str] = None,
    group_size: Optional[int] = None,
) -> int:
    return sum(
        s.wire_bytes
        for s in stats
        if (primitive is None or s.primitive == primitive)
        and (group_size is None or s.group_size == group_size)
    )


def summarize(stats: List[CollectiveStat]) -> str:
    lines = ["primitive        group  operand_bytes    wire_bytes"]
    for s in stats:
        lines.append(
            f"{s.primitive:15s} {s.group_size:5d} {s.operand_bytes:14,d} "
            f"{s.wire_bytes:13,d}"
        )
    lines.append(f"TOTAL wire bytes/device: {total_wire_bytes(stats):,d}")
    return "\n".join(lines)
