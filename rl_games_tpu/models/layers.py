"""Building-block layers for the config-driven network builder.

Flax-linen re-designs of the reference's torso components:
  * activation / initializer factories — network_builder.py:50-73
    (torch-default Linear init reproduced for 'default')
  * MLP with optional layer/batch norm — network_builder.py:110-135
  * D2RL dense-skip MLP — algos_torch/d2rl.py:3-33
  * CNN stacks (conv2d / conv1d / coord_conv / spatial softargmax) —
    network_builder.py:160-209, spatial_softmax.py:7-72
  * Impala residual tower — network_builder.py:599-688
  * Done-masked multi-layer LSTM/GRU core — common/layers/recurrent.py:26-58
    (the per-step masked formulation, exact math of the reference's
    segment-splitting loop, realized as nn.scan over time)
"""

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# ---------------------------------------------------------------------------
# Activation factory (network_builder.py:50-59)
# ---------------------------------------------------------------------------

ACTIVATIONS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "elu": jax.nn.elu,
    "selu": jax.nn.selu,
    "swish": jax.nn.silu,
    "silu": jax.nn.silu,
    "gelu": jax.nn.gelu,
    "softplus": jax.nn.softplus,
    "None": lambda x: x,
    None: lambda x: x,
}


def get_activation(name) -> Callable:
    return ACTIVATIONS[name]


# ---------------------------------------------------------------------------
# Initializer factory (network_builder.py:61-73)
# ---------------------------------------------------------------------------


def torch_default_kernel_init(key, shape, dtype=jnp.float32):
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    flax kernel shape is (fan_in, fan_out).
    """
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def get_initializer(cfg: Optional[dict]):
    """Map a reference initializer config {'name': ..., **kw} to a flax init."""
    if not cfg:
        return torch_default_kernel_init
    name = cfg.get("name", "default")
    if name == "const_initializer":
        val = cfg.get("val", cfg.get("value", 0))
        return jax.nn.initializers.constant(float(val))
    if name in ("orthogonal_initializer", "orthogonal"):
        return jax.nn.initializers.orthogonal(scale=float(cfg.get("gain", 1.0)))
    if name == "glorot_normal_initializer":
        return jax.nn.initializers.glorot_normal()
    if name == "glorot_uniform_initializer":
        return jax.nn.initializers.glorot_uniform()
    if name == "variance_scaling_initializer":
        return jax.nn.initializers.variance_scaling(
            scale=float(cfg.get("scale", 2.0)), mode="fan_in",
            distribution="truncated_normal",
        )
    if name == "random_uniform_initializer":
        lo = float(cfg.get("a", cfg.get("minval", 0.0)))
        hi = float(cfg.get("b", cfg.get("maxval", 1.0)))

        def uniform_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, lo, hi)

        return uniform_init
    if name == "kaiming_normal":
        return jax.nn.initializers.he_normal()
    return torch_default_kernel_init


class Dense(nn.Module):
    """nn.Dense following the reference builders' init convention: the
    zero-bias pass runs over EVERY nn.Linear regardless of the configured
    initializer — 'default' only means the weight keeps torch's
    kaiming-uniform (init_factory maps it to nn.Identity), the bias is
    still zeroed (network_builder.py:330-338 A2CBuilder, :1025-1033
    SACBuilder). Known documented deviation: the reference's
    A2CResnetBuilder (:767-775) skips the zero-bias pass and keeps torch's
    uniform biases on its MLP; our merged builder applies the A2C
    convention to the impala family too."""

    features: int
    kernel_init: Callable = torch_default_kernel_init

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            kernel_init=self.kernel_init,
            bias_init=jax.nn.initializers.zeros,
        )(x)


def make_dense(features, init_cfg: Optional[dict], name: Optional[str] = None):
    """Dense with reference init: configured weight init ('default' =
    torch's kaiming-uniform) + unconditional zero bias."""
    if not init_cfg or init_cfg.get("name", "default") == "default":
        return Dense(features, name=name)
    return Dense(
        features,
        kernel_init=get_initializer(init_cfg),
        name=name,
    )


# ---------------------------------------------------------------------------
# MLP / D2RL
# ---------------------------------------------------------------------------


class MLP(nn.Module):
    """Sequential MLP (network_builder.py:110-135): Dense→act→[norm] per unit."""

    units: Sequence[int]
    activation: str
    initializer: Optional[dict] = None
    norm_func_name: Optional[str] = None
    norm_only_first_layer: bool = False

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        need_norm = True
        for unit in self.units:
            x = make_dense(unit, self.initializer)(x)
            x = act(x)
            if need_norm:
                if self.norm_only_first_layer and self.norm_func_name is not None:
                    need_norm = False
                if self.norm_func_name == "layer_norm":
                    x = nn.LayerNorm(epsilon=1e-5)(x)
                elif self.norm_func_name == "batch_norm":
                    # stateless batch-norm stand-in: layer norm semantics are
                    # the jit-friendly choice; reference batch_norm is unused
                    # by the shipped configs
                    x = nn.LayerNorm(epsilon=1e-5)(x)
        return x


class D2RLMLP(nn.Module):
    """Dense-skip MLP (d2rl.py:3-33): input concatenated before layers 1..n.

    Note the reference applies norm AFTER activation on layer 0 but BEFORE
    activation on later layers — preserved here.
    """

    units: Sequence[int]
    activation: str
    initializer: Optional[dict] = None
    norm_func_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        inp = x

        def norm(y):
            if self.norm_func_name in ("layer_norm", "batch_norm"):
                return nn.LayerNorm(epsilon=1e-5)(y)
            return y

        x = make_dense(self.units[0], self.initializer)(inp)
        x = act(x)
        x = norm(x)
        for unit in self.units[1:]:
            x = jnp.concatenate([x, inp], axis=-1)
            x = make_dense(unit, self.initializer)(x)
            x = norm(x)
            x = act(x)
        return x


class _ParamsOnlyDense(nn.Module):
    """Declares an nn.Dense-shaped (kernel, bias) param pair without the
    matmul — lets FusedMLP own parameters whose tree is byte-identical to
    MLP's (``Dense_{i}/Dense_0/{kernel,bias}``) while the compute runs in
    the fused Pallas kernel."""

    features: int
    kernel_init: Callable = torch_default_kernel_init

    @nn.compact
    def __call__(self, in_dim):
        k = self.param("kernel", self.kernel_init, (in_dim, self.features))
        b = self.param("bias", jax.nn.initializers.zeros, (self.features,))
        return k, b


class FusedDense(nn.Module):
    """Scope mirror of the Dense wrapper (outer Dense_{i} → inner Dense_0)."""

    features: int
    kernel_init: Callable = torch_default_kernel_init

    @nn.compact
    def __call__(self, in_dim):
        return _ParamsOnlyDense(
            self.features, self.kernel_init, name="Dense_0"
        )(in_dim)


class FusedMLP(nn.Module):
    """Fully-fused sequential MLP — the TPU analog of the reference's
    tiny-cuda-nn net (rl_games/networks/tcnn_mlp.py:6-43), selected with
    ``network.mlp.fused: true``. Parameter tree and init convention are
    identical to MLP (same Dense_{i} scopes, zero bias), so fused and
    plain checkpoints are interchangeable; compute goes through
    ops.fused_mlp (one Pallas kernel, all weights VMEM-resident, exact
    custom-VJP gradients)."""

    units: Sequence[int]
    activation: str
    initializer: Optional[dict] = None

    @nn.compact
    def __call__(self, x):
        from rl_games_tpu.ops.fused_mlp import fused_mlp

        if not self.initializer or self.initializer.get(
            "name", "default"
        ) == "default":
            kinit = torch_default_kernel_init
        else:
            kinit = get_initializer(self.initializer)
        ws, bs = [], []
        d = x.shape[-1]
        for i, unit in enumerate(self.units):
            k, b = FusedDense(unit, kinit, name=f"Dense_{i}")(d)
            ws.append(k)
            bs.append(b)
            d = unit
        return fused_mlp(x, tuple(ws), tuple(bs), self.activation)


def build_mlp(units, activation, initializer=None, norm_func_name=None,
              d2rl=False, norm_only_first_layer=False, name=None,
              fused=False):
    if fused:
        if d2rl or norm_func_name:
            raise ValueError(
                "mlp.fused: true supports the plain sequential MLP only "
                "(no d2rl, no normalization) — same restriction as the "
                "reference's tcnn net (networks/tcnn_mlp.py)."
            )
        return FusedMLP(units, activation, initializer, name=name)
    if d2rl:
        return D2RLMLP(units, activation, initializer, norm_func_name, name=name)
    return MLP(units, activation, initializer, norm_func_name,
               norm_only_first_layer, name=name)


# ---------------------------------------------------------------------------
# CNN stacks — NHWC layout (TPU-native; the reference permutes to NCHW for
# torch, network_builder.py:233-236 — we instead keep XLA's preferred NHWC)
# ---------------------------------------------------------------------------


class SpatialSoftArgmax(nn.Module):
    """Soft arg-max over each feature map (spatial_softmax.py:7-72).

    Input NHWC; output [B, C*2] of (x, y) expected pixel coordinates.
    """

    normalize: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        flat = x.transpose(0, 3, 1, 2).reshape(b * c, h * w)
        softmax = jax.nn.softmax(flat, axis=-1)
        if self.normalize:
            xs = jnp.linspace(-1.0, 1.0, w)
            ys = jnp.linspace(-1.0, 1.0, h)
        else:
            xs = jnp.arange(w, dtype=jnp.float32)
            ys = jnp.arange(h, dtype=jnp.float32)
        # reference meshgrid(x over w, y over h) with default 'ij' indexing:
        # xc[i,j] = xs[i] broadcast over h — flattened in (w, h) order
        xc = jnp.repeat(xs, h)
        yc = jnp.tile(ys, w)
        x_mean = (softmax * xc).sum(-1)
        y_mean = (softmax * yc).sum(-1)
        return jnp.stack([x_mean, y_mean], axis=-1).reshape(b, c * 2)


class CNN(nn.Module):
    """Conv2d stack from a `convs` config list (network_builder.py:160-188)."""

    convs: Sequence[dict]
    activation: str
    initializer: Optional[dict] = None
    norm_func_name: Optional[str] = None
    ctype: str = "conv2d"

    @nn.compact
    def __call__(self, x):
        act = get_activation(self.activation)
        kernel_init = (
            get_initializer(self.initializer)
            if self.initializer
            else torch_default_kernel_init
        )
        is_1d = self.ctype == "conv1d"
        for i, conv in enumerate(self.convs):
            if not isinstance(conv, dict):
                conv = dict(conv)  # frozen (key, value) tuples from the builder
            if self.ctype == "coord_conv2d":
                # CoordConv (torch_ext.py:223-240): append normalized x/y
                # (+ r on request) coordinate channels before each conv
                b, h, w, _ = x.shape
                yy = jnp.broadcast_to(
                    jnp.linspace(-1.0, 1.0, h)[None, :, None, None], (b, h, w, 1)
                )
                xx = jnp.broadcast_to(
                    jnp.linspace(-1.0, 1.0, w)[None, None, :, None], (b, h, w, 1)
                )
                x = jnp.concatenate([x, xx, yy], axis=-1)
            k = conv["kernel_size"]
            s = conv["strides"]
            p = conv["padding"]
            if is_1d:
                kernel = (k,) if isinstance(k, int) else tuple(k)
                strides = (s,) if isinstance(s, int) else tuple(s)
                padding = [(p, p)] if isinstance(p, int) else p
            else:
                kernel = (k, k) if isinstance(k, int) else tuple(k)
                strides = (s, s) if isinstance(s, int) else tuple(s)
                padding = [(p, p), (p, p)] if isinstance(p, int) else p
            x = nn.Conv(
                conv["filters"],
                kernel_size=kernel,
                strides=strides,
                padding=padding,
                kernel_init=kernel_init,
                bias_init=jax.nn.initializers.zeros,
            )(x)
            x = act(x)
            if self.norm_func_name in ("layer_norm", "batch_norm"):
                x = nn.LayerNorm(epsilon=1e-5)(x)
        if self.ctype == "conv2d_spatial_softargmax":
            x = SpatialSoftArgmax(normalize=True)(x)
        return x


class ChannelAttention(nn.Module):
    """Squeeze-and-excitation channel attention (network_builder.py:614-629):
    sigmoid(MLP(avgpool) + MLP(maxpool)) channel gate. NHWC layout."""

    channels: int
    reduction: int = 16

    @nn.compact
    def __call__(self, x):
        hidden = max(1, self.channels // self.reduction)
        fc1 = nn.Dense(hidden, use_bias=False, name="fc1")
        fc2 = nn.Dense(self.channels, use_bias=False, name="fc2")
        avg = fc2(jax.nn.relu(fc1(x.mean(axis=(1, 2)))))
        mx = fc2(jax.nn.relu(fc1(x.max(axis=(1, 2)))))
        return jax.nn.sigmoid(avg + mx)[:, None, None, :]


class SpatialAttention(nn.Module):
    """Spatial attention (network_builder.py:632-640): sigmoid(conv7x7 over
    [channel-mean, channel-max]) spatial gate."""

    kernel_size: int = 7

    @nn.compact
    def __call__(self, x):
        avg = x.mean(axis=-1, keepdims=True)
        mx = x.max(axis=-1, keepdims=True)
        g = nn.Conv(
            1, (self.kernel_size, self.kernel_size), padding="SAME",
            use_bias=False,
        )(jnp.concatenate([avg, mx], axis=-1))
        return jax.nn.sigmoid(g)


class FrozenBatchNorm(nn.Module):
    """BatchNorm2d analog with FROZEN statistics (network_builder.py
    ConvBlock :599-611 pairs Conv2dAuto with nn.BatchNorm2d).

    mean/var live in params but are stop_gradient'ed, so Adam never moves
    them (zero gradient -> zero update): imported torch running stats give
    exact eval parity, and continued training fine-tunes scale/bias around
    the frozen stats. Documented deviation from torch's train mode (which
    normalizes by minibatch stats and updates the running buffers) — true
    batch statistics would thread cross-batch mutable state through the
    jitted epoch, which the pure-functional TPU design deliberately
    avoids. Fresh (non-imported) training starts at mean 0 / var 1, i.e.
    a fixed affine transform."""

    channels: int
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", jax.nn.initializers.ones, (self.channels,))
        bias = self.param("bias", jax.nn.initializers.zeros, (self.channels,))
        mean = self.param("mean", jax.nn.initializers.zeros, (self.channels,))
        var = self.param("var", jax.nn.initializers.ones, (self.channels,))
        mean = jax.lax.stop_gradient(mean)
        var = jax.lax.stop_gradient(var)
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        return (x - mean) * inv + bias


class ImpalaConvBlock(nn.Module):
    """ConvBlock (network_builder.py:599-611): 3x3 conv, stride 1; with
    use_bn the conv drops its bias and a (frozen-stats) BatchNorm
    follows."""

    channels: int
    use_bn: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.channels, (3, 3), padding="SAME", use_bias=not self.use_bn
        )(x)
        if self.use_bn:
            x = FrozenBatchNorm(self.channels)(x)
        return x


class ImpalaResidualBlock(nn.Module):
    """network_builder.py:643-672; optional SE-style channel + spatial
    attention gates (use_attention), optional batch-norm conv blocks
    (use_bn) and zero-initialized residual scaling (use_zero_init:
    ``x*alpha + residual`` with a learnable scalar alpha starting at 0)."""

    channels: int
    use_attention: bool = False
    use_bn: bool = False
    use_zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        x = jax.nn.relu(x)
        x = ImpalaConvBlock(self.channels, self.use_bn)(x)
        x = jax.nn.relu(x)
        x = ImpalaConvBlock(self.channels, self.use_bn)(x)
        if self.use_attention:
            x = ChannelAttention(self.channels)(x) * x
            x = SpatialAttention()(x) * x
        if self.use_zero_init:
            alpha = self.param("alpha", jax.nn.initializers.zeros, (1,))
            return x * alpha + residual
        return x + residual


class ImpalaSequential(nn.Module):
    """conv → maxpool(3,2) → 2 residual blocks (network_builder.py:675-688)."""

    channels: int
    use_attention: bool = False
    use_bn: bool = False
    use_zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        x = ImpalaConvBlock(self.channels, self.use_bn)(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        x = ImpalaResidualBlock(
            self.channels, self.use_attention, self.use_bn, self.use_zero_init
        )(x)
        x = ImpalaResidualBlock(
            self.channels, self.use_attention, self.use_bn, self.use_zero_init
        )(x)
        return x


class ImpalaCNN(nn.Module):
    """Impala tower from a `conv_depths` config (network_builder.py:714-727).

    use_bn/use_zero_init mirror the reference's library-level ResidualBlock
    options (:643-672) that its YAML builder leaves at their defaults —
    exposed here as cnn-config extensions so checkpoints of hand-built
    reference variants import cleanly."""

    conv_depths: Sequence[int]
    use_attention: bool = False
    use_bn: bool = False
    use_zero_init: bool = False

    @nn.compact
    def __call__(self, x):
        for depth in self.conv_depths:
            x = ImpalaSequential(
                depth, self.use_attention, self.use_bn, self.use_zero_init
            )(x)
        x = jax.nn.relu(x)
        return x.reshape(x.shape[0], -1)


class NoisyLinear(nn.Module):
    """NoisyNet linear layer with INDEPENDENT per-element gaussian noise
    (algos_torch/layers.py:9-30 NoisyLinear): w = mu_w + sigma_w * eps with
    eps ~ N(0,1) per weight, sigma_init = 0.017 constant, mu init
    U(±sqrt(3/fan_in)) for weight AND bias. Exploration noise is resampled
    via an explicit key (pass None for the deterministic mean-weight
    forward). The reference's separate factorized variant
    (NoisyFactorizedLinear, :33-55) is NoisyFactorizedLinear below."""

    features: int
    sigma_init: float = 0.017

    @nn.compact
    def __call__(self, x, noise_key=None):
        in_f = x.shape[-1]
        # symmetric uniform(-sqrt(3/in_f), +sqrt(3/in_f)) — layers.py:19-22
        # (flax's uniform() samples [0, scale) only)
        bound = (3.0 / in_f) ** 0.5
        sym_uniform = (
            lambda key, shape, dtype=jnp.float32:
            jax.random.uniform(key, shape, dtype, -bound, bound)
        )
        mu_w = self.param("mu_w", sym_uniform, (in_f, self.features))
        mu_b = self.param("mu_b", sym_uniform, (self.features,))
        sig_w = self.param(
            "sigma_w", nn.initializers.constant(self.sigma_init),
            (in_f, self.features),
        )
        sig_b = self.param(
            "sigma_b", nn.initializers.constant(self.sigma_init),
            (self.features,),
        )
        if noise_key is None:
            return x @ mu_w + mu_b
        k1, k2 = jax.random.split(noise_key)
        # independent N(0,1) per element (layers.py:25-30)
        w = mu_w + sig_w * jax.random.normal(k1, (in_f, self.features))
        b = mu_b + sig_b * jax.random.normal(k2, (self.features,))
        return x @ w + b


class NoisyFactorizedLinear(nn.Module):
    """NoisyNet factorized-gaussian variant (algos_torch/layers.py:33-55
    NoisyFactorizedLinear): w = mu_w + sigma_w * (f(eps_in) f(eps_out)^T)
    with f(e) = sign(e)·sqrt(|e|), sigma_init = sigma_zero/sqrt(fan_in),
    torch's default Linear init (U(±1/sqrt(fan_in))) for mu."""

    features: int
    sigma_zero: float = 0.4

    @nn.compact
    def __call__(self, x, noise_key=None):
        in_f = x.shape[-1]
        bound = (1.0 / in_f) ** 0.5

        def torch_linear_uniform(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        mu_w = self.param(
            "mu_w", torch_default_kernel_init, (in_f, self.features)
        )
        mu_b = self.param("mu_b", torch_linear_uniform, (self.features,))
        sigma_init = self.sigma_zero / (in_f ** 0.5)
        sig_w = self.param(
            "sigma_w", nn.initializers.constant(sigma_init),
            (in_f, self.features),
        )
        sig_b = self.param(
            "sigma_b", nn.initializers.constant(sigma_init),
            (self.features,),
        )
        if noise_key is None:
            return x @ mu_w + mu_b
        k1, k2 = jax.random.split(noise_key)
        f = lambda e: jnp.sign(e) * jnp.sqrt(jnp.abs(e))
        eps_in = f(jax.random.normal(k1, (in_f,)))
        eps_out = f(jax.random.normal(k2, (self.features,)))
        w = mu_w + sig_w * jnp.outer(eps_in, eps_out)
        b = mu_b + sig_b * eps_out
        return x @ w + b


# ---------------------------------------------------------------------------
# Done-masked recurrent core
# ---------------------------------------------------------------------------


class _StackStep(nn.Module):
    """One time-step through a stack of RNN cells with done masking.

    carry: tuple over layers of cell carries; input: (x_t, done_t).
    done_t ∈ {0,1} [B, 1]: the hidden state is zeroed BEFORE processing a
    step whose `done` flag is set (recurrent.py:26-58 semantics — dones mark
    the first step of a new episode segment).
    """

    kind: str
    units: int
    num_layers: int

    @nn.compact
    def __call__(self, carry, inp):
        x_t, done_t = inp
        keep = 1.0 - done_t
        new_carry = []
        h = x_t
        for i in range(self.num_layers):
            c_i = jax.tree.map(lambda c: c * keep, carry[i])
            if self.kind == "lstm":
                cell = nn.OptimizedLSTMCell(self.units, name=f"lstm_{i}")
            else:
                cell = nn.GRUCell(self.units, name=f"gru_{i}")
            c_i, h = cell(c_i, h)
            new_carry.append(c_i)
        return tuple(new_carry), h


class RNNCore(nn.Module):
    """Multi-layer LSTM/GRU/identity unrolled over time with done masking.

    Call: (x [num_seqs, seq_len, F], states, dones [num_seqs, seq_len] or None)
      → (out [num_seqs, seq_len, units], new_states)

    ``states`` uses the reference's checkpoint layout
    (get_default_rnn_state, network_builder.py:517-540):
      lstm → (h, c) each [num_layers, num_seqs, units]
      gru  → (h,)         [num_layers, num_seqs, units]
    """

    kind: str  # 'lstm' | 'gru' | 'identity'
    units: int
    num_layers: int = 1

    @nn.compact
    def __call__(self, x, states, dones=None):
        if self.kind == "identity":
            return x, states
        num_seqs, seq_len, _ = x.shape
        if dones is None:
            dones = jnp.zeros((num_seqs, seq_len), x.dtype)
        if states is None:
            # zero initial states, like the reference's None defense
            # (network_builder.py:466-478) — export/tracing call sites
            # invoke forward_play without explicit rnn_states
            zeros = jnp.zeros((self.num_layers, num_seqs, self.units), x.dtype)
            states = (zeros, zeros) if self.kind == "lstm" else (zeros,)
        # states → per-layer flax carries
        if self.kind == "lstm":
            h, c = states
            carry = tuple((c[i], h[i]) for i in range(self.num_layers))
        else:
            (h,) = states
            carry = tuple(h[i] for i in range(self.num_layers))

        xs = x.transpose(1, 0, 2)  # time-major
        ds = dones.transpose(1, 0)[..., None].astype(x.dtype)

        scan = nn.scan(
            _StackStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=0,
            out_axes=0,
        )
        carry, ys = scan(self.kind, self.units, self.num_layers, name="stack")(
            carry, (xs, ds)
        )

        if self.kind == "lstm":
            new_h = jnp.stack([carry[i][1] for i in range(self.num_layers)])
            new_c = jnp.stack([carry[i][0] for i in range(self.num_layers)])
            new_states = (new_h, new_c)
        else:
            new_states = (jnp.stack(list(carry)),)
        return ys.transpose(1, 0, 2), new_states


def default_rnn_state(kind: str, num_layers: int, num_seqs: int, units: int):
    """Zero initial states in the reference layout
    (network_builder.py:517-540)."""
    if kind == "identity":
        units = 1
    shape = (num_layers, num_seqs, units)
    if kind == "lstm":
        return (jnp.zeros(shape, jnp.float32), jnp.zeros(shape, jnp.float32))
    return (jnp.zeros(shape, jnp.float32),)
