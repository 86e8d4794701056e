"""Fully-fused MLP forward — the TPU analog of the reference's TCNN net.

The reference optionally swaps its policy MLP for tiny-cuda-nn's
fully-fused CUDA MLP (rl_games/networks/tcnn_mlp.py:6-43), whose trick is
keeping every layer's weights in on-chip memory and evaluating the whole
network in one kernel launch instead of one launch + HBM activation
round-trip per layer. This module is the same idea expressed for TPU with
Pallas: one ``pallas_call`` whose grid walks batch tiles while ALL layer
weights stay resident in VMEM; each tile runs the full
matmul→bias→activation chain on the MXU/VPU without ever spilling
intermediate activations to HBM.

Scope matches tiny-cuda-nn's: a plain sequential MLP (Dense→activation per
layer, no normalization). The config surface is ``network.mlp.fused: true``
(the analog of the reference's ``network.name: tcnnnet``); layers.FusedMLP
wires it into the builder.

Differentiation: ``fused_mlp`` carries a ``jax.custom_vjp`` whose backward
recomputes through the plain jnp forward, so gradients are exact
everywhere; the fused kernel is the *forward/inference* fast path (rollout
and players), which is where tiny-cuda-nn earns its keep in the reference
too (its fused training path is half-precision-only and optional).

Dispatch: Pallas kernel on TPU, plain jnp chain elsewhere;
``RLG_TPU_FUSED_MLP=0`` kills the kernel (same pattern as ops/gae.py's
RLG_TPU_GAE_BACKEND and the reference's RLG_NO_TRITON).
"""

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ACTS = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "gelu": jax.nn.gelu,
    "swish": jax.nn.swish,
    "silu": jax.nn.swish,
    "softplus": jax.nn.softplus,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "none": lambda x: x,
    "None": lambda x: x,
    "linear": lambda x: x,
}


def _act(name):
    return _ACTS[name if name in _ACTS else str(name).lower()]


def _elu_kernel(x):
    # exp/where only: Mosaic has no expm1 lowering
    return jnp.where(x > 0, x, jnp.exp(jnp.minimum(x, 0.0)) - 1.0)


def _selu_kernel(x):
    alpha, scale = 1.6732632423543772, 1.0507009873554805
    return scale * jnp.where(x > 0, x, alpha * (jnp.exp(jnp.minimum(x, 0.0)) - 1.0))


def _softplus_kernel(x):
    # numerically-stable log1p-free form: max(x,0) + log(1 + exp(-|x|))
    return jnp.maximum(x, 0.0) + jnp.log(1.0 + jnp.exp(-jnp.abs(x)))


def _gelu_kernel(x):
    # tanh approximation (same as jax.nn.gelu approximate=True)
    c = 0.7978845608028654  # sqrt(2/pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x * x * x)))


def _sigmoid_kernel(x):
    return 1.0 / (1.0 + jnp.exp(-x))


# In-kernel variants restricted to Mosaic-lowered primitives
# (exp/log/tanh/where); everything else falls through to _ACTS.
_KERNEL_ACTS = {
    "elu": _elu_kernel,
    "selu": _selu_kernel,
    "softplus": _softplus_kernel,
    "gelu": _gelu_kernel,
    "sigmoid": _sigmoid_kernel,
    "swish": lambda x: x * _sigmoid_kernel(x),
    "silu": lambda x: x * _sigmoid_kernel(x),
}


def _kernel_act(name):
    key = name if name in _ACTS else str(name).lower()
    return _KERNEL_ACTS.get(key, _ACTS[key])


def plain_mlp(x, ws, bs, activation):
    """Reference jnp chain: Dense→activation per layer (layers.MLP)."""
    f = _act(activation)
    for w, b in zip(ws, bs):
        x = f(jnp.dot(x, w) + b)
    return x


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _fused_kernel(x_ref, *refs, n_layers, activation):
    """One batch tile through the whole layer chain, VMEM-resident.

    refs = (w_0, b_0, ..., w_{L-1}, b_{L-1}, out). Weights use constant
    index maps so Pallas keeps them in VMEM across the batch grid.
    """
    f = _kernel_act(activation)
    h = x_ref[:]
    for i in range(n_layers):
        w = refs[2 * i][:]
        b = refs[2 * i + 1][:]
        h = f(jnp.dot(h, w, preferred_element_type=jnp.float32) + b)
    refs[-1][:] = h


def fused_mlp_pallas(x, ws, bs, activation, *, interpret=False, block_b=1024):
    """Pallas fully-fused MLP forward.

    x: [B, D0]; ws[i]: [D_i, D_{i+1}]; bs[i]: [D_{i+1}]. Returns [B, D_L].
    Feature dims are zero-padded to 128 lanes (padded lanes feed zero rows
    of the next layer's padded weights, so any activation garbage in them
    is annihilated before it can reach a real output); batch is padded to
    the tile size and sliced back.
    """
    B, D0 = x.shape
    n_layers = len(ws)
    dims = [D0] + [w.shape[1] for w in ws]
    dims_p = [_round_up(max(d, 128), 128) for d in dims]

    bb = min(block_b, _round_up(max(B, 8), 8))
    Bp = _round_up(B, bb)

    f32 = jnp.float32
    x_p = jnp.pad(x.astype(f32), ((0, Bp - B), (0, dims_p[0] - D0)))
    ws_p = [
        jnp.pad(w.astype(f32),
                ((0, dims_p[i] - w.shape[0]), (0, dims_p[i + 1] - w.shape[1])))
        for i, w in enumerate(ws)
    ]
    bs_p = [
        jnp.pad(b.astype(f32), (0, dims_p[i + 1] - b.shape[0])).reshape(1, -1)
        for i, b in enumerate(bs)
    ]

    grid = (Bp // bb,)
    x_spec = pl.BlockSpec((bb, dims_p[0]), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    wb_specs = []
    for li in range(n_layers):
        wb_specs.append(pl.BlockSpec((dims_p[li], dims_p[li + 1]),
                                     lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
        wb_specs.append(pl.BlockSpec((1, dims_p[li + 1]), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((bb, dims_p[-1]), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    flops = 2 * Bp * sum(dims_p[i] * dims_p[i + 1] for i in range(n_layers))
    out = pl.pallas_call(
        functools.partial(_fused_kernel, n_layers=n_layers,
                          activation=activation),
        grid=grid,
        in_specs=[x_spec] + wb_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((Bp, dims_p[-1]), f32),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (Bp * dims_p[0] + Bp * dims_p[-1]
                                + sum(w.size for w in ws_p)),
            transcendentals=Bp * dims_p[-1],
        ),
        interpret=interpret,
    )(x_p, *[a for pair in zip(ws_p, bs_p) for a in pair])

    return out[:B, :dims[-1]].astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_mlp(x, ws, bs, activation):
    """Fused-MLP forward with exact gradients (plain-chain VJP)."""
    use_kernel = (
        jax.default_backend() == "tpu"
        and os.environ.get("RLG_TPU_FUSED_MLP", "1") != "0"
    )
    if use_kernel:
        return fused_mlp_pallas(x, tuple(ws), tuple(bs), activation)
    return plain_mlp(x, ws, bs, activation)


def _fused_mlp_fwd(x, ws, bs, activation):
    return fused_mlp(x, ws, bs, activation), (x, ws, bs)


def _fused_mlp_bwd(activation, res, g):
    x, ws, bs = res
    _, vjp = jax.vjp(lambda xx, ww, bb: plain_mlp(xx, ww, bb, activation),
                     x, ws, bs)
    return vjp(g)


fused_mlp.defvjp(_fused_mlp_fwd, _fused_mlp_bwd)
