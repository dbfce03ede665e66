"""Checkpoint / resume.

ref: the reference checkpoints through the state_dict protocol with
sharded weights exposed as ShardedTensors re-shardable by key
(SURVEY §5.4; torchrec/distributed/model_parallel.py:392-456,
batched_embedding_kernel.py:184-246, optim/keyed.py:69-227).

TPU design, two levels:

* `save_reshardable` / `load_reshardable`: a flat npz of UNSHARDED
  per-table weights + FQN-keyed dense params — portable across topologies
  and plans (the "re-shardable by key" property). Fused momenta restart
  fresh on reshard, matching a plan change.

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
    """Flat npz: dense params by FQN + original unsharded table weights.

    Fused optimizer momenta are saved in their SHARDED layout with a
    shape signature: loading onto the identical plan restores them
    exactly (the reference's same-plan resume contract); a different
    plan restarts momenta fresh (ref: momentum tensors are plan-shaped,
    batched_embedding_kernel.py:204-246)."""
    flat: Dict[str, np.ndarray] = {}
    for k, v in flatten_with_fqns(state.dense_params).items():
        flat[f"dense/{k}"] = np.asarray(v)
    for key, ebc in dmp.sharded_ebcs.items():
        tables = ebc.unshard_to_dense(state.emb_states[key])
        for name, w in tables.items():
            flat[f"tables/{key}/{name}"] = np.asarray(
                w, dtype=np.float32
            )
        for gi, gs in enumerate(state.emb_states[key]):
            opt = gs.opt
            if opt.momentum1 is not None:
                flat[f"opt/{key}/{gi}/m1"] = np.asarray(opt.momentum1)
            if opt.momentum2 is not None:
                flat[f"opt/{key}/{gi}/m2"] = np.asarray(opt.momentum2)
            flat[f"opt/{key}/{gi}/step"] = np.asarray(opt.step)
    flat["step"] = np.asarray(state.step)
    np.savez(path, **flat)


def load_reshardable(path: str, dmp, state):
    """Rebuild a DMPState from an npz onto the CURRENT plan/topology."""
    data = np.load(path)
    dense_flat = {
        k[len("dense/"):]: data[k] for k in data.files if k.startswith("dense/")
    }
    dense_params = unflatten_from_fqns(state.dense_params, dense_flat)
    dense_params = jax.tree.map(jax.numpy.asarray, dense_params)
    new_emb = dict(state.emb_states)
    for key, ebc in dmp.sharded_ebcs.items():
        prefix = f"tables/{key}/"
        tables = {
            k[len(prefix):]: data[k] for k in data.files if k.startswith(prefix)
        }
        if tables:
            groups = list(ebc.shard_from_dense(tables))
            # same-plan momentum restore (shape signature must match)
            for gi, gs in enumerate(groups):
                opt = gs.opt
                m1k, m2k = f"opt/{key}/{gi}/m1", f"opt/{key}/{gi}/m2"
                stk = f"opt/{key}/{gi}/step"
                ok = True
                for mk, cur in ((m1k, opt.momentum1), (m2k, opt.momentum2)):
                    if (mk in data.files) != (cur is not None):
                        ok = False
                    elif cur is not None and data[mk].shape != cur.shape:
                        ok = False
                if ok and stk in data.files:
                    new_opt = opt.replace(
                        momentum1=None if opt.momentum1 is None
                        else jax.device_put(
                            jax.numpy.asarray(data[m1k]),
                            opt.momentum1.sharding,
                        ),
                        momentum2=None if opt.momentum2 is None
                        else jax.device_put(
                            jax.numpy.asarray(data[m2k]),
                            opt.momentum2.sharding,
                        ),
                        step=jax.numpy.asarray(data[stk]),
                    )
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
