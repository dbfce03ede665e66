"""Interop with reference (torch) TorchRec checkpoints.

A user migrating from the reference framework holds `state_dict()`s whose
embedding tables live under module-FQN keys like
``model.sparse_arch.embedding_bag_collection.embedding_bags.<table>.weight``
(EmbeddingBagCollection registers one ``nn.EmbeddingBag`` per table in an
``nn.ModuleDict`` — ref embedding_modules.py:136; EmbeddingCollection uses
``embeddings.<table>.weight`` — ref embedding_modules.py:265; the reference
DistributedModelParallel re-exports the same original FQNs — ref
model_parallel.py:392-456).

`import_torch_state_dict` loads those tables into a torchrec_tpu
`DistributedModelParallel` state: tables are matched by NAME, ambiguities
resolved by the torch module path, and the arrays flow through
`DMP.load_tables` (resharding on load, so the torch checkpoint's layout
never needs to match the TPU plan). `export_torch_state_dict` writes the
trained tables back out under reference-style FQNs.

torch is imported lazily — the module also accepts plain numpy mappings,
so tests and numpy-only archives work without torch installed.
"""

from __future__ import annotations

import logging
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np

logger = logging.getLogger(__name__)

# <prefix>.embedding_bags.<table>.weight  (EBC, ref embedding_modules.py:136)
# <prefix>.embeddings.<table>.weight      (EC,  ref embedding_modules.py:265)
_TABLE_KEY_RE = re.compile(
    r"^(?P<prefix>.*?)(?:^|\.)(?:embedding_bags|embeddings)"
    r"\.(?P<table>[^.]+)\.weight$"
)


def _to_numpy(v: Any) -> np.ndarray:
    """torch.Tensor / np.ndarray / array-like -> float32 numpy."""
    if hasattr(v, "detach"):  # torch.Tensor without importing torch
        # .float() first: bf16/fp16 tensors raise on .numpy(), and we
        # return float32 regardless
        v = v.detach().cpu().float().numpy()
    return np.asarray(v, np.float32)


def _ndim(v: Any) -> int:
    """Rank without materializing a converted copy. ndim == 0 is a real
    answer (and np.asarray raises on 0-dim torch bf16 scalars), so only
    a MISSING attribute falls through to numpy."""
    nd = getattr(v, "ndim", None)
    return int(nd) if nd is not None else np.asarray(v).ndim


def _load_mapping(sd: Any) -> Mapping[str, Any]:
    """Accept a mapping, a torch nn.Module, or a path to a torch .pt."""
    if isinstance(sd, (str,)) or hasattr(sd, "__fspath__"):
        import torch

        obj = torch.load(sd, map_location="cpu", weights_only=True)
        if not isinstance(obj, Mapping):
            raise TypeError(
                f"torch.load({sd!r}) returned {type(obj).__name__}, "
                "expected a state_dict mapping"
            )
        return obj
    if hasattr(sd, "state_dict") and not isinstance(sd, Mapping):
        return sd.state_dict()
    return sd


def _path_score(torch_prefix: str, module_key: str) -> int:
    """Length of the common path SUFFIX (in segments) between the torch
    module prefix (dots) and a DMP module key (slashes). The suffix is
    what survives arbitrary wrapper nesting on either side."""
    a = [s for s in torch_prefix.replace("/", ".").split(".") if s]
    b = [s for s in module_key.split("/") if s]
    n = 0
    while n < min(len(a), len(b)) and a[-1 - n] == b[-1 - n]:
        n += 1
    return n


@dataclass
class ImportReport:
    """What an import did — returned so a migration script can assert."""

    loaded: Dict[str, List[str]] = field(default_factory=dict)
    #: torch keys that matched no table (dense params, buffers, ...)
    skipped_keys: List[str] = field(default_factory=list)
    #: table keys whose rows only partially overlapped ours
    partial_rows: List[str] = field(default_factory=list)

    @property
    def num_tables(self) -> int:
        return sum(len(v) for v in self.loaded.values())


def extract_tables(sd: Any) -> Dict[str, Dict[str, np.ndarray]]:
    """{torch module prefix -> {table name -> [rows, dim] float32}} from a
    reference state_dict (mapping / nn.Module / .pt path)."""
    mapping = _load_mapping(sd)
    out: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in mapping.items():
        m = _TABLE_KEY_RE.match(k)
        if m is None:
            continue
        arr = _to_numpy(v)
        if arr.ndim != 2:
            continue  # not an embedding table (e.g. scalar 'weight')
        out.setdefault(m.group("prefix").rstrip("."), {})[
            m.group("table")
        ] = arr
    return out


def import_torch_state_dict(
    dmp,
    state,
    sd: Any,
    strict: bool = True,
) -> Tuple[Any, ImportReport]:
    """Load a reference checkpoint's embedding tables into a DMP state.

    Matching: by table name against the DMP's modules; when two modules
    hold a table of the same name, the torch module path disambiguates
    (longest common path suffix with the DMP module key — a tie raises).
    Row-count mismatches load the overlapping prefix (torchrec_tpu models
    may extend tables, e.g. BERT4Rec's positional rows) and are recorded
    in ``report.partial_rows``; under ``strict`` a table present in the
    checkpoint whose dim mismatches raises instead of being skipped.

    Returns ``(new_state, report)``. Dense (non-embedding) entries are
    never touched — they are architecture-specific; the report lists them
    so a migration script can map them explicitly.
    """
    mapping = _load_mapping(sd)  # load once; extract_tables passes it through
    by_prefix = extract_tables(mapping)
    if not by_prefix:
        raise ValueError(
            "no embedding tables found in the state dict (expected keys "
            "matching '...embedding_bags.<table>.weight' or "
            "'...embeddings.<table>.weight')"
        )
    table_keys = {
        f"{p}.{t}" if p else t for p, ts in by_prefix.items() for t in ts
    }

    # current dense view: {module key -> {table -> np}} — also the merge
    # base, since shard_from_dense wants every table of a module
    current = {
        k.split("/", 1)[1]: dict(v)
        for k, v in dmp.state_dict(state).items()
        if k.startswith("embeddings/")
    }
    owners: Dict[str, List[str]] = {}
    for mk, tabs in current.items():
        for t in tabs:
            owners.setdefault(t, []).append(mk)

    report = ImportReport()
    to_load: Dict[str, Dict[str, np.ndarray]] = {}
    for prefix, tabs in by_prefix.items():
        for tname, arr in tabs.items():
            cands = owners.get(tname, [])
            if not cands:
                report.skipped_keys.append(
                    f"{prefix + '.' if prefix else ''}{tname}.weight "
                    "(no such table here)"
                )
                continue
            if len(cands) > 1:
                scored = sorted(
                    ((_path_score(prefix, mk), mk) for mk in cands),
                    reverse=True,
                )
                if scored[0][0] == scored[1][0]:
                    raise ValueError(
                        f"table {tname!r} is ambiguous between modules "
                        f"{[mk for _, mk in scored]} and the torch path "
                        f"{prefix!r} does not disambiguate"
                    )
                mk = scored[0][1]
            else:
                mk = cands[0]
            cur = np.asarray(current[mk][tname])
            if arr.shape[1] != cur.shape[1]:
                msg = (
                    f"table {tname!r}: checkpoint dim {arr.shape[1]} != "
                    f"model dim {cur.shape[1]}"
                )
                if strict:
                    raise ValueError(msg)
                logger.warning("%s — skipped", msg)
                report.skipped_keys.append(f"{tname}.weight ({msg})")
                continue
            if arr.shape[0] != cur.shape[0]:
                rows = min(arr.shape[0], cur.shape[0])
                merged = cur.copy()
                merged[:rows] = arr[:rows]
                arr = merged
                report.partial_rows.append(tname)
            to_load.setdefault(mk, dict(current[mk]))[tname] = arr
            report.loaded.setdefault(mk, []).append(tname)

    for k in mapping:
        m = _TABLE_KEY_RE.match(k)
        if m is None:
            report.skipped_keys.append(k)
        elif _ndim(mapping[k]) != 2:
            report.skipped_keys.append(k)

    if strict and not to_load:
        raise ValueError(
            f"no checkpoint table matched this model (checkpoint tables: "
            f"{sorted(table_keys)[:8]}...)"
        )
    new_state = dmp.load_tables(state, to_load) if to_load else state
    return new_state, report


# reference DLRM dense FQNs (ref models/dlrm.py:116-258 — DenseArch holds
# MLP at .model, OverArch a Sequential(MLP, Linear) at .model; MLP layers
# are Perceptron._linear, ref modules/mlp.py:58,132)
_DLRM_DENSE_RE = re.compile(
    r"(?:^|\.)dense_arch\.model\._mlp\.(?P<i>\d+)\._linear"
    r"\.(?P<p>weight|bias)$"
)
_DLRM_OVER_MLP_RE = re.compile(
    r"(?:^|\.)over_arch\.model\.0\._mlp\.(?P<i>\d+)\._linear"
    r"\.(?P<p>weight|bias)$"
)
_DLRM_OVER_HEAD_RE = re.compile(
    r"(?:^|\.)over_arch\.model\.1\.(?P<p>weight|bias)$"
)


def _set_path(tree: Dict, path: Tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        if p not in node or not isinstance(node[p], dict):
            raise KeyError(
                f"dense param path {'/'.join(path)} not found in the "
                f"model tree (at {p!r}; have {sorted(node)})"
            )
        node = node[p]
    if path[-1] not in node:
        raise KeyError(f"dense param leaf {'/'.join(path)} not found")
    cur = np.asarray(node[path[-1]])
    if cur.shape != value.shape:
        raise ValueError(
            f"dense param {'/'.join(path)}: checkpoint shape "
            f"{value.shape} != model shape {cur.shape}"
        )
    node[path[-1]] = value.astype(cur.dtype)


def import_dlrm_dense(dmp, state, sd: Any) -> Tuple[Any, List[str]]:
    """Load a reference DLRM checkpoint's DENSE params (the MLPs the
    table importer deliberately skips) into the DMP state.

    torch ``nn.Linear`` stores ``weight`` as ``[out, in]`` acting as
    ``x @ W.T + b``; flax ``Dense`` stores ``kernel`` as ``[in, out]``
    acting as ``x @ K + b`` — so ``kernel = weight.T``. Layer mapping:

    * ``dense_arch.model._mlp.<i>._linear`` -> ``dense_arch/MLP_0/Perceptron_<i>/Dense_0``
    * ``over_arch.model.0._mlp.<i>._linear`` -> ``over_arch/MLP_0/Perceptron_<i>/Dense_0``
    * ``over_arch.model.1`` (final Linear)   -> ``over_arch/head/Dense_0``

    The dense optimizer state is left as-is (a fresh-momentum resume,
    same semantics as a cross-plan table load). Returns
    ``(new_state, matched_torch_keys)``; raises if a matched key's shape
    disagrees with the model, or if nothing matches.
    """
    mapping = _load_mapping(sd)
    # _unfreeze rebuilds every dict level, so leaf reassignment below
    # never aliases the caller's tree
    params = _unfreeze(state.dense_params)

    # the flax subtree that holds dense_arch/over_arch, wherever nested
    def find_root(node, path=()):
        if isinstance(node, dict):
            if "dense_arch" in node and "over_arch" in node:
                return path
            for k, v in node.items():
                r = find_root(v, path + (k,))
                if r is not None:
                    return r
        return None

    root = find_root(params)
    if root is None:
        raise ValueError(
            "model's dense params contain no dense_arch/over_arch subtree "
            "— import_dlrm_dense only maps the DLRM architecture"
        )

    matched: List[str] = []
    for k, v in mapping.items():
        for rex, arch, head in (
            (_DLRM_DENSE_RE, "dense_arch", False),
            (_DLRM_OVER_MLP_RE, "over_arch", False),
            (_DLRM_OVER_HEAD_RE, "over_arch", True),
        ):
            m = rex.search(k)
            if m is None:
                continue
            arr = _to_numpy(v)
            p = m.group("p")
            leaf = "kernel" if p == "weight" else "bias"
            if p == "weight":
                arr = arr.T  # torch [out, in] -> flax [in, out]
            if head:
                sub: Tuple[str, ...] = (arch, "head", "Dense_0", leaf)
            else:
                sub = (
                    arch, "MLP_0", f"Perceptron_{m.group('i')}",
                    "Dense_0", leaf,
                )
            _set_path(params, root + sub, arr)
            matched.append(k)
            break
    if not matched:
        raise ValueError(
            "no reference DLRM dense params found (expected keys like "
            "'...dense_arch.model._mlp.0._linear.weight')"
        )
    return state.replace(dense_params=_refreeze(state.dense_params, params)), matched


def _unfreeze(tree):
    try:  # flax FrozenDict or plain dict
        from flax.core import FrozenDict, unfreeze

        if isinstance(tree, FrozenDict):
            return unfreeze(tree)
    except Exception:  # noqa: BLE001 - flax layout drift
        pass
    if isinstance(tree, dict):
        return {
            k: _unfreeze(v) if isinstance(v, (dict,)) or _is_frozen(v)
            else v
            for k, v in tree.items()
        }
    return tree


def _is_frozen(v) -> bool:
    try:
        from flax.core import FrozenDict

        return isinstance(v, FrozenDict)
    except Exception:  # noqa: BLE001
        return False


def _refreeze(original, tree):
    try:
        from flax.core import FrozenDict, freeze

        if isinstance(original, FrozenDict):
            return freeze(tree)
    except Exception:  # noqa: BLE001
        pass
    return tree


def export_torch_state_dict(
    dmp,
    state,
    kind_attr: Optional[Dict[str, str]] = None,
    as_torch: bool = True,
) -> Dict[str, Any]:
    """Trained tables under reference-style FQNs:
    ``<module key with dots>.embedding_bags.<table>.weight`` (pooled
    modules) / ``.embeddings.<table>.weight`` (sequence ECs), so the
    arrays drop into a reference ``EmbeddingBagCollection`` /
    ``EmbeddingCollection`` ``load_state_dict``. ``kind_attr`` overrides
    the container attribute per module key."""
    out: Dict[str, Any] = {}
    for k, tabs in dmp.state_dict(state).items():
        if not k.startswith("embeddings/"):
            continue
        mk = k.split("/", 1)[1]
        attr = (kind_attr or {}).get(
            mk,
            "embeddings"
            if dmp._kinds.get(mk) == "ec"
            else "embedding_bags",
        )
        for tname, arr in tabs.items():
            key = f"{mk.replace('/', '.')}.{attr}.{tname}.weight"
            arr = np.asarray(arr, np.float32)
            if as_torch:
                import torch

                out[key] = torch.from_numpy(arr.copy())
            else:
                out[key] = arr
    return out
