"""Tensor-trace encoding of kernel expression trees.

The reference stores trees in Gen choicemaps addressed by binary-heap index
(Model.jl:101-118, inference_utils.jl:206-246); here the heap is literal:
  node_type: int32[M], params_z: float[M,3]  with M = 2^depth_cap - 1.
Params are stored *whitened* (the z-space over which HMC runs), exactly as
the choicemap stores `normal(0,1)` draws.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from autogp_tpu import config as C
from autogp_tpu import kernels as K
from autogp_tpu import model as M_


# Field names per node type, in the same order as Julia fieldnames
# (Model.jl:92, inference_utils.jl:217).
NODE_FIELDS = {
    C.CONSTANT: ("value",),
    C.LINEAR: ("intercept", "bias", "amplitude"),
    C.SQUARED_EXPONENTIAL: ("lengthscale", "amplitude"),
    C.GAMMA_EXPONENTIAL: ("lengthscale", "gamma", "amplitude"),
    C.PERIODIC: ("lengthscale", "period", "amplitude"),
    C.CHANGEPOINT: ("location",),
    C.WHITE_NOISE: ("value",),
}

NODE_CLASS = {
    C.CONSTANT: K.Constant,
    C.LINEAR: K.Linear,
    C.SQUARED_EXPONENTIAL: K.SquaredExponential,
    C.GAMMA_EXPONENTIAL: K.GammaExponential,
    C.PERIODIC: K.Periodic,
    C.PLUS: K.Plus,
    C.TIMES: K.Times,
    C.CHANGEPOINT: K.ChangePoint,
    C.WHITE_NOISE: K.WhiteNoise,
}

CLASS_CODE = {v: k for k, v in NODE_CLASS.items()}


def node_code(node: K.Node) -> int:
    return CLASS_CODE[type(node)]


def node_to_tensor(node: K.Node, config: C.GPConfig
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """Encode a symbolic kernel into (node_type[M], params_z[M,3]).

    Parameters are untransformed into whitened space
    (inference_utils.jl:206-246). Raises if the tree exceeds the static
    depth cap.
    """
    M = config.max_nodes
    node_type = np.zeros((M,), dtype=np.int32)
    params_z = np.zeros((M, C.MAX_PARAMS), dtype=np.float64)

    def rec(n: K.Node, idx: int):
        if idx >= M:
            raise ValueError(
                f"kernel tree depth exceeds static cap {config.depth_cap}")
        code = node_code(n)
        node_type[idx] = code
        if isinstance(n, K.LeafNode) or isinstance(n, K.ChangePoint):
            for j, f in enumerate(NODE_FIELDS[code]):
                params_z[idx, j] = M_.untransform_param(
                    f if f in ("gamma", "period") else "wildcard",
                    getattr(n, f), config)
        if isinstance(n, K.BinaryOpNode):
            rec(n.left, 2 * idx + 1)
            rec(n.right, 2 * idx + 2)

    rec(node, 0)
    return node_type, params_z


def tensor_to_node(node_type, params_z, config: C.GPConfig) -> K.Node:
    """Decode a tensor trace back into a symbolic kernel."""
    node_type = np.asarray(node_type)
    params_z = np.asarray(params_z, dtype=np.float64)

    def rec(idx: int) -> K.Node:
        code = int(node_type[idx])
        if code == C.INACTIVE:
            raise ValueError(f"inactive slot {idx} reached during decode")
        if code in (C.PLUS, C.TIMES):
            return NODE_CLASS[code](rec(2 * idx + 1), rec(2 * idx + 2))
        if code == C.CHANGEPOINT:
            loc = float(M_.transform_param(
                "wildcard", params_z[idx, 0], config))
            return K.ChangePoint(rec(2 * idx + 1), rec(2 * idx + 2),
                                 loc, C.CHANGEPOINT_SCALE)
        fields = NODE_FIELDS[code]
        vals = []
        for j, f in enumerate(fields):
            kind = f if f in ("gamma", "period") else "wildcard"
            vals.append(float(M_.transform_param(kind, params_z[idx, j],
                                                 config)))
        return NODE_CLASS[code](*vals)

    return rec(0)


# ---------------------------------------------------------------------------
# Structure utilities on the device-side encoding
# ---------------------------------------------------------------------------

def subtree_sizes(node_type):
    """[M] number of active nodes in the subtree rooted at each slot.

    Static reverse-BFS accumulation (Base.size at GP.jl:93-95).
    """
    M = node_type.shape[0]
    active = (node_type > 0).astype(jnp.int32)
    sizes = [None] * M
    for s in reversed(range(M)):
        l = 2 * s + 1
        r = 2 * s + 2
        child_sum = 0
        if l < M:
            child_sum = sizes[l] + sizes[r]
        sizes[s] = active[s] * (1 + child_sum)
    return jnp.stack(sizes)


def tree_depth(node_type):
    """Depth (1-based) of the active tree rooted at slot 0."""
    M = node_type.shape[0]
    depths = np.array([int(np.floor(np.log2(i + 1))) + 1 for i in range(M)])
    return jnp.max(jnp.where(node_type > 0, jnp.asarray(depths), 0))


def num_active_params(node_type):
    """Number of active continuous tree parameters (HMC dimension)."""
    ar = jnp.asarray(C.PARAM_ARITY)[node_type]
    return jnp.sum(ar)


def param_mask(node_type):
    """[M,3] {0,1} mask of active continuous parameter slots."""
    ar = jnp.asarray(C.PARAM_ARITY)[node_type]
    return (jnp.arange(C.MAX_PARAMS)[None, :] < ar[:, None]).astype(
        jnp.float32)
