"""Module-construction helpers (ref: torchrec/modules/utils.py:14-120).

The reference's helpers exist to tame torch's imperative module system:
turning callables/classes into modules, probing output dims by running a
dummy tensor, applying xavier init post-hoc, and deep-copying one module
into a ModuleList. flax removes most of that machinery (declarative
init, immutable module dataclasses, explicit RNG), so the equivalents
here are thin — but they keep the reference's API names so migrating
model code has a direct target, and `get_module_output_dimension` is
shape-level (jax.eval_shape), never materializing parameters.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp


def extract_module_or_tensor_callable(
    module_or_callable: Union[Callable[[], nn.Module], nn.Module, Callable],
) -> Union[nn.Module, Callable]:
    """ref: modules/utils.py:14-37. Accept a module instance, a zero-arg
    module factory (class or lambda), or an array->array callable, and
    return the thing you can call on an Array. flax modules are already
    callables; factories are instantiated here."""
    if isinstance(module_or_callable, nn.Module):
        return module_or_callable
    if isinstance(module_or_callable, type):
        inst = module_or_callable()
        if not isinstance(inst, nn.Module):
            raise ValueError(
                "the class provided is not a flax Module class"
            )
        return inst
    if callable(module_or_callable):
        return module_or_callable
    raise ValueError(
        "module_or_callable must be a flax Module, a Module factory, or "
        "a callable over arrays"
    )


def get_module_output_dimension(
    module: Union[nn.Module, Callable],
    in_features: int,
) -> int:
    """ref: modules/utils.py:38-46 (runs a dummy tensor through the
    module). Here the probe is SHAPE-LEVEL: jax.eval_shape traces the
    module on an abstract [1, in_features] input — no parameters are
    materialized, no FLOPs run."""
    x = jax.ShapeDtypeStruct((1, in_features), jnp.float32)
    if isinstance(module, nn.Module):
        out = jax.eval_shape(
            lambda a: module.init_with_output(jax.random.PRNGKey(0), a)[0],
            x,
        )
    else:
        out = jax.eval_shape(module, x)
    return int(out.shape[-1])


def check_module_output_dimension(
    module: Union[Sequence[Any], nn.Module, Callable],
    in_features: int,
    out_features: int,
) -> bool:
    """ref: modules/utils.py:47-68. Verify the module (or every module
    of a sequence) maps [*, in_features] -> [*, out_features]."""
    if isinstance(module, (list, tuple)):
        return all(
            check_module_output_dimension(m, in_features, out_features)
            for m in module
        )
    return get_module_output_dimension(module, in_features) == out_features


def xavier_uniform_init():
    """ref: modules/utils.py:69-74 (init_mlp_weights_xavier_uniform). In
    flax, init is declared, not applied post-hoc: pass this as the
    Dense/MLP kernel_init instead of mutating built modules."""
    return nn.initializers.xavier_uniform()


def construct_modulelist_from_single_module(
    module: nn.Module, sizes: Tuple[int, ...]
) -> Tuple:
    """ref: modules/utils.py:75-98 (deep-copies one module into a nested
    ModuleList, re-initializing each copy). flax modules are immutable
    specs: the SAME instance declared in N tree positions gets N
    independent parameter sets at init, so 'copies' are just a nested
    tuple of the spec."""
    if not sizes:
        return ()
    if len(sizes) == 1:
        return tuple(module for _ in range(sizes[0]))
    return tuple(
        construct_modulelist_from_single_module(module, sizes[1:])
        for _ in range(sizes[0])
    )


def convert_list_of_modules_to_modulelist(
    modules: Sequence[nn.Module], sizes: Tuple[int, ...]
) -> Tuple:
    """ref: modules/utils.py:99-120. Reshape a flat module sequence into
    the nested tuple structure `sizes` describes (flax submodule lists
    are plain tuples declared on the parent)."""
    total = 1
    for s in sizes:
        total *= s
    if len(modules) != total:
        raise ValueError(
            f"the numbers of modules ({len(modules)}) do not match "
            f"the sizes {sizes}"
        )
    if len(sizes) == 1:
        return tuple(modules)
    inner = total // sizes[0]
    return tuple(
        convert_list_of_modules_to_modulelist(
            modules[i * inner:(i + 1) * inner], sizes[1:]
        )
        for i in range(sizes[0])
    )
