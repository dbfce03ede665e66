"""Checkpoint / resume.

ref: the reference checkpoints through the state_dict protocol with
sharded weights AND fused optimizer momenta exposed as ShardedTensors
re-shardable by key (SURVEY §5.4; torchrec/distributed/
model_parallel.py:392-456, batched_embedding_kernel.py:71-118,204-246,
optim/keyed.py:69-227).

TPU design, two levels:

* `save_reshardable` / `load_reshardable`: a flat npz of UNSHARDED
  per-table weights, per-table CANONICAL fused optimizer momenta, FQN-keyed
  dense params, and host-offloaded (UVM) tables + momenta — portable across
  topologies and plans. Momenta reshard exactly whenever semantics allow:
  full momenta ([R, D], Adam/LAMB/Adagrad) under ANY plan change; rowwise
  momenta ([R]) across any row-space plans (DP/RW/TW/TWRW, any world size);
  column-sharded rowwise momenta ([S, R] virtual tables) exactly when the
  column-shard count matches, averaged over shards (exact: the rowwise
  accumulator is mean(g²) over local columns and shards are equal-width,
  so the shard mean IS the full-row accumulator) when moving to row
  space, and replicated (approximation, logged warning) when entering
  column space. Kind mismatches (optimizer changed across the save)
  restart fresh with a logged warning naming the table/tag.

* `save_state` / `restore_state`: orbax checkpoint of the full DMPState
  pytree (sharded weights, momenta, dense optimizer, step) for exact
  same-topology resume.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import numpy as np

from torchrec_tpu.optim.keyed import flatten_with_fqns, unflatten_from_fqns


def save_reshardable(path: str, dmp, state) -> None:
    """Flat npz: dense params by FQN, unsharded table weights (device AND
    host-offloaded UVM), and per-table canonical fused momenta."""
    flat: Dict[str, np.ndarray] = {}
    for k, v in flatten_with_fqns(state.dense_params).items():
        flat[f"dense/{k}"] = np.asarray(v)
    for key, ebc in dmp.sharded_ebcs.items():
        if ebc is not None:
            tables = ebc.unshard_to_dense(state.emb_states[key])
            for name, w in tables.items():
                flat[f"tables/{key}/{name}"] = np.asarray(
                    w, dtype=np.float32
                )
            if not hasattr(ebc, "strategies"):
                continue  # tower collections: weights reshard, opt restarts
            for strat, gs in zip(ebc.strategies, state.emb_states[key]):
                for tname, entry in strat.unshard_opt_to_tables(
                    gs.opt
                ).items():
                    for tag, arr in entry.items():
                        flat[f"opt/{key}/{tname}/{tag}"] = arr
        # host-offloaded UVM tables: weights ride with the other tables,
        # momentum under its own prefix (ADVICE r1: these were silently
        # omitted -> the largest tables vanished from Criteo checkpoints)
        uvm = getattr(dmp, "_uvm_mods", {}).get(key)
        if uvm is not None:
            for name, w in uvm.state_dict().items():
                flat[f"tables/{key}/{name}"] = np.asarray(w, np.float32)
            for name, m in uvm.momentum_dict().items():
                # keep integer entries (the Adam `.step` counter) in
                # their own dtype: a float32 cast rounds step > 2^24
                # and breaks exact bias-correction resume
                m = np.asarray(m)
                if not np.issubdtype(m.dtype, np.integer):
                    m = m.astype(np.float32)
                flat[f"uvmopt/{key}/{name}"] = m
    flat["step"] = np.asarray(state.step)
    np.savez(path, **flat)


def load_reshardable(path: str, dmp, state):
    """Rebuild a DMPState from an npz onto the CURRENT plan/topology.

    Weights always reshard; fused momenta reshard from their canonical
    per-table form (see module docstring for exactness guarantees)."""
    data = np.load(path)
    dense_flat = {
        k[len("dense/"):]: data[k] for k in data.files if k.startswith("dense/")
    }
    dense_params = unflatten_from_fqns(state.dense_params, dense_flat)
    dense_params = jax.tree.map(jax.numpy.asarray, dense_params)

    # weights (device + UVM) through the DMP reshard path
    tables_by_key: Dict[str, Dict[str, np.ndarray]] = {}
    uvm_momentum: Dict[str, Dict[str, np.ndarray]] = {}
    for k in data.files:
        # module keys are "/"-joined attribute paths; only the trailing
        # component (the table name) is slash-free
        if k.startswith("tables/"):
            key, name = k[len("tables/"):].rsplit("/", 1)
            tables_by_key.setdefault(key, {})[name] = data[k]
        elif k.startswith("uvmopt/"):
            key, name = k[len("uvmopt/"):].rsplit("/", 1)
            uvm_momentum.setdefault(key, {})[name] = data[k]
    state = dmp.load_tables(
        state, tables_by_key, uvm_momentum=uvm_momentum or None
    )

    # device fused momenta from canonical per-table form
    new_emb = dict(state.emb_states)
    for key, ebc in dmp.sharded_ebcs.items():
        if ebc is None or not hasattr(ebc, "strategies"):
            continue
        prefix = f"opt/{key}/"
        per_table: Dict[str, Dict[str, np.ndarray]] = {}
        for k in data.files:
            if k.startswith(prefix):
                rest = k[len(prefix):]
                # exactly "{table}/{tag}": a rest with extra slashes
                # belongs to a DIFFERENT module whose key extends this
                # one (e.g. "m" vs "m/sub") — don't sweep it in
                if rest.count("/") != 1:
                    continue
                tname, tag = rest.rsplit("/", 1)
                per_table.setdefault(tname, {})[tag] = data[k]
        if not per_table:
            continue
        groups = list(new_emb[key])
        for gi, (strat, gs) in enumerate(zip(ebc.strategies, groups)):
            new_opt = strat.shard_opt_from_tables(per_table, gs.opt)
            if new_opt is not None:
                groups[gi] = gs.replace(opt=new_opt)
        new_emb[key] = tuple(groups)
    return state.replace(
        dense_params=dense_params,
        emb_states=new_emb,
        step=jax.numpy.asarray(data["step"]),
    )


def save_state(path: str, state) -> None:
    """Exact orbax checkpoint of the full DMPState pytree."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), state, force=True)


def restore_state(path: str, state_template):
    """Restore a DMPState saved by save_state; the template provides the
    pytree structure, shardings and static fields."""
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(
            os.path.abspath(path),
            args=ocp.args.PyTreeRestore(state_template),
        )
