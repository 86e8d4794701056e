"""Import reference (PyTorch rl_games) checkpoints into this framework.

The migration path for reference users: a `.pth` checkpoint produced by the
reference trainer (torch_ext.save_checkpoint, algos_torch/torch_ext.py —
``{'model': state_dict, 'epoch': ..., ...}``) converts into this framework's
(net_params, norm) pair for the same YAML network config, so trained policies
carry over without retraining. Conversion is **target-driven**: we walk OUR
parameter tree and pull each leaf from the torch state dict, so any unconsumed
or missing tensor is a hard error, never a silent mis-load.

Covered: the A2CBuilder family (algos_torch/network_builder.py:120-320) with
MLP torsos (shared or separate trunks), plain conv2d stacks, continuous
logstd heads (fixed or state-dependent sigma), discrete / multi-discrete
logits, and the RunningMeanStd input/value normalizers
(running_mean_std.py:48-75). Layout transforms:

* ``nn.Linear.weight`` [out, in] → flax ``Dense.kernel`` [in, out] (transpose);
* ``nn.Conv2d.weight`` [O, I, kH, kW] → flax ``Conv.kernel`` [kH, kW, I, O];
* the first Linear after a conv stack additionally needs its input columns
  re-ordered: the reference flattens NCHW activations (c, h, w row-major,
  network_builder.py:92) while this framework flattens NHWC (h, w, c) —
  the spatial dims are recomputed from the conv arithmetic to build the
  permutation;
* ``torch.compile``'s ``_orig_mod.`` prefixes are stripped, like the
  reference's own checkpoint loader does (torch_ext.py load_checkpoint);
* LSTM/GRU cores (LSTMWithDones/GRUWithDones wrapping torch.nn.LSTM/GRU,
  common/layers/recurrent.py:77-86): torch packs gates row-blocked in
  ``weight_ih_l{k}``/``weight_hh_l{k}`` (LSTM order i,f,g,o; GRU r,z,n)
  and ADDS ``bias_ih + bias_hh``, while flax cells hold one Dense per
  gate — the blocks are split, transposed, and the two biases summed onto
  the gate Dense that carries bias (flax puts it on the hidden-side Dense
  for LSTM; for GRU's n gate both biases stay separate, matching torch's
  ``W_in x + b_in + r*(W_hn h + b_hn)`` form exactly);
* dict observations: the reference's RunningMeanStdObs ModuleDict
  (running_mean_std.py:117-128, keys
  ``running_mean_std.running_mean_std.<obs_key>.*``) maps onto our
  per-key dict of RunningMeanStd states.

SAC checkpoints convert through ``convert_sac_weights`` below. d2rl concat
torsos import directly (same param layout as plain MLPs, torch-side
'linears' ModuleList prefix), and impala towers
(A2CResnetBuilder/'resnet_actor_critic': per-stage ConvBlock + residual
blocks, maxpool flatten arithmetic, the builder's 'mlp' torso prefix).
Not covered (clear errors): normalized torsos, rnn
concat_input/concat_output wirings, d2rl fed by a conv stack, and impala
use_bn/use_zero_init variants.
"""

from typing import Any, Dict, Tuple

import numpy as np


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a reference checkpoint file → flat {name: np.ndarray}."""
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(raw, dict) and "model" in raw and isinstance(
        raw["model"], dict
    ):
        raw = raw["model"]
    return flatten_state_dict(raw)


def flatten_state_dict(sd) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        k = k.replace("_orig_mod.", "")
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            out[k] = np.asarray(v)
    return out


def _conv_out_hw(h: int, w: int, convs) -> Tuple[int, int]:
    """Spatial dims after the reference conv stack (VALID + explicit int
    padding, network_builder.py _build_cnn)."""
    for c in convs:
        k = int(c["kernel_size"])
        s = int(c["strides"])
        p = int(c.get("padding", 0))
        h = (h + 2 * p - k) // s + 1
        w = (w + 2 * p - k) // s + 1
    return h, w


def _impala_out_hw(h: int, w: int, n_stages: int) -> Tuple[int, int]:
    """Spatial dims after an impala tower: each stage is a SAME conv plus
    MaxPool2d(kernel 3, stride 2, padding 1) → floor((h-1)/2)+1
    (network_builder.py:675-688)."""
    for _ in range(n_stages):
        h = (h - 1) // 2 + 1
        w = (w - 1) // 2 + 1
    return h, w


def _nchw_to_nhwc_columns(weight: np.ndarray, h: int, w: int,
                          ch: int) -> np.ndarray:
    """Reorder a [out, C*H*W] Linear weight's input columns from the
    reference's NCHW flatten to this framework's NHWC flatten, then
    transpose to a flax kernel [H*W*C, out]."""
    assert weight.shape[1] == ch * h * w, (
        f"flatten size mismatch: weight in={weight.shape[1]} vs "
        f"C*H*W={ch}*{h}*{w}"
    )
    # our flat index (h, w, c) -> torch column c*H*W + h*W + w
    hh, ww, cc = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(ch), indexing="ij"
    )
    perm = (cc * h * w + hh * w + ww).reshape(-1)
    return weight[:, perm].T


class _TorchSide:
    """Indexes the torch state dict by module group; tracks consumption."""

    def __init__(self, sd: Dict[str, np.ndarray]):
        self.sd = dict(sd)
        self.consumed = set()

    def take(self, key: str) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(
                f"torch checkpoint is missing '{key}' "
                f"(have: {sorted(self.sd)[:12]}...)"
            )
        self.consumed.add(key)
        return self.sd[key]

    def seq_layers(self, prefix: str):
        """[(weight, bias)] of `a2c_network.<prefix>.<idx>` sorted by idx."""
        idxs = set()
        full = f"a2c_network.{prefix}."
        for k in self.sd:
            if k.startswith(full) and k.endswith(".weight"):
                idxs.add(int(k[len(full):].split(".")[0]))
        return [
            (
                self.take(f"{full}{i}.weight"),
                self.take(f"{full}{i}.bias"),
            )
            for i in sorted(idxs)
        ]

    def leftovers(self):
        return [k for k in self.sd if k not in self.consumed]


def _check_unsupported(sd: Dict[str, np.ndarray], network_cfg: dict):
    rnn_cfg = network_cfg.get("rnn") or {}
    if (
        rnn_cfg.get("concat_input") or rnn_cfg.get("concat_output")
    ) and network_cfg.get("cnn"):
        # with a conv torso the concat wirings splice FLATTENED conv
        # columns into the rnn-input / head-input matrices, so the
        # NCHW->NHWC permutation would apply to a column SLICE of those
        # kernels — refuse rather than silently mis-permute (no reference
        # config pairs a cnn with the concat wirings)
        raise NotImplementedError(
            "rnn concat_input/concat_output on a conv torso is not covered "
            "by the torch-checkpoint importer (flatten permutation would "
            "straddle the concat columns)"
        )
    if network_cfg.get("mlp", {}).get("d2rl") and network_cfg.get("cnn"):
        raise NotImplementedError(
            "d2rl torsos fed by a conv stack are not covered by the "
            "torch-checkpoint importer: the NCHW->NHWC flatten permutation "
            "would also apply to every layer's skip-concat input columns"
        )
    if network_cfg.get("normalization") == "batch_norm":
        # torch BatchNorm1d trains on minibatch stats; this framework's
        # torso stand-in is layer-norm semantics (models/layers.py MLP),
        # so the imported weights would compute a different function —
        # refuse clearly (no shipped reference config uses batch_norm)
        raise NotImplementedError(
            "batch_norm-normalized torsos are not covered by the "
            "torch-checkpoint importer (layer_norm torsos are)"
        )
    if network_cfg.get("normalization") and network_cfg.get("mlp", {}).get(
        "d2rl"
    ):
        raise NotImplementedError(
            "normalized d2rl torsos are not covered by the "
            "torch-checkpoint importer"
        )
    if network_cfg.get("cnn", {}).get("type") == "impala":
        cnn_cfg = network_cfg["cnn"]
        for k in sd:
            if k.endswith(".alpha") and not cnn_cfg.get("use_zero_init"):
                raise NotImplementedError(
                    f"checkpoint carries zero-init residual scalars ({k}) "
                    "— set cnn.use_zero_init: True in the network config "
                    "to import it"
                )
            if ".bn." in k and not cnn_cfg.get("use_bn"):
                raise NotImplementedError(
                    f"checkpoint carries impala batch-norm tensors ({k}) "
                    "— set cnn.use_bn: True in the network config to "
                    "import it"
                )


def _assign(dst: dict, path: Tuple[str, ...], value: np.ndarray):
    cur = dst
    for p in path[:-1]:
        cur = cur[p]
    old = cur[path[-1]]
    if tuple(old.shape) != tuple(value.shape):
        raise ValueError(
            f"shape mismatch at {'/'.join(path)}: model expects "
            f"{tuple(old.shape)}, checkpoint provides {tuple(value.shape)}"
        )
    import jax.numpy as jnp

    cur[path[-1]] = jnp.asarray(value, old.dtype)


def _to_mutable(tree):
    if isinstance(tree, dict):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def convert_a2c_state_dict(
    sd: Dict[str, np.ndarray],
    net_params: Any,
    norm: Any,
    network_cfg: dict,
    input_shape,
) -> Tuple[Any, Any]:
    """(torch state dict, our example (net_params, norm)) → imported pair.

    `network_cfg` is the YAML ``params['network']`` dict; `input_shape` the
    observation shape (H, W, C) for conv nets, (D,) otherwise.
    """
    network_cfg = dict(network_cfg)
    if network_cfg.get("name") == "resnet_actor_critic":
        # the resnet builder family IS the impala torso (model_builder.py
        # _build_resnet_network applies the same normalization)
        cnn = dict(network_cfg.get("cnn") or {})
        cnn.setdefault("type", "impala")
        network_cfg["cnn"] = cnn
    _check_unsupported(sd, network_cfg)
    src = _TorchSide(sd)
    params = _to_mutable(net_params)
    body = params["params"]

    cnn_cfg = network_cfg.get("cnn", {})
    convs = cnn_cfg.get("convs")
    flat_hw = None
    if convs:
        h, w = int(input_shape[0]), int(input_shape[1])
        flat_hw = _conv_out_hw(h, w, convs) + (int(convs[-1]["filters"]),)
    elif cnn_cfg.get("type") == "impala":
        depths = list(cnn_cfg["conv_depths"])
        h, w = int(input_shape[0]), int(input_shape[1])
        flat_hw = _impala_out_hw(h, w, len(depths)) + (int(depths[-1]),)
    rnn_before_mlp = bool(
        (network_cfg.get("rnn") or {}).get("before_mlp", False)
    )

    def fill_mlp(name: str):
        if name not in body:
            return
        # d2rl torsos (common/d2rl.py D2RLNet) keep their Linears in a
        # 'linears' ModuleList; our D2RLMLP shares the plain MLP's param
        # layout and concat order (cat[x, input]), so only the torch-side
        # prefix differs
        is_d2rl = bool(network_cfg.get("mlp", {}).get("d2rl"))
        prefix = name + ".linears" if is_d2rl else name
        # the resnet builder names its shared torso 'mlp', not 'actor_mlp'
        # (A2CResnetBuilder, network_builder.py:745)
        if not any(
            k.startswith(f"a2c_network.{prefix}.") for k in src.sd
        ):
            alt = prefix.replace("actor_", "", 1)
            if any(k.startswith(f"a2c_network.{alt}.") for k in src.sd):
                prefix = alt
        all_layers = src.seq_layers(prefix)
        # a normalized torso's Sequential interleaves LayerNorm entries
        # (1-D weight) with the Linear ones (2-D weight); split them and
        # pair each kind with its flax modules in order
        # (_build_sequential_mlp, reference network_builder.py:105-130:
        # Linear -> act -> LayerNorm per unit)
        layers = [(w, b) for w, b in all_layers if w.ndim == 2]
        norms = [(w, b) for w, b in all_layers if w.ndim == 1]
        dense_names = sorted(
            (k for k in body[name] if k.startswith("Dense_")),
            key=lambda s: int(s.rsplit("_", 1)[1]),
        )
        ln_names = sorted(
            (k for k in body[name] if k.startswith("LayerNorm_")),
            key=lambda s: int(s.rsplit("_", 1)[1]),
        )
        if len(layers) != len(dense_names):
            raise ValueError(
                f"{name}: torch checkpoint has {len(layers)} Linear layers, "
                f"model expects {len(dense_names)}"
            )
        if len(norms) != len(ln_names):
            raise ValueError(
                f"{name}: torch checkpoint has {len(norms)} LayerNorm "
                f"layers, model expects {len(ln_names)}"
            )
        for ln, (wt, bs) in zip(ln_names, norms):
            _assign(body, (name, ln, "scale"), wt)
            _assign(body, (name, ln, "bias"), bs)
        for i, (dn, (wt, bs)) in enumerate(zip(dense_names, layers)):
            # the first Linear after a conv stack consumes flattened
            # activations -> needs the NCHW->NHWC column permutation
            # (with rnn before_mlp the RNN, not the mlp, eats the flatten)
            cnn_feeds = flat_hw is not None and i == 0 and not rnn_before_mlp
            if cnn_feeds:
                kern = _nchw_to_nhwc_columns(wt, *flat_hw)
            else:
                kern = wt.T
            _assign(body, (name, dn, "Dense_0", "kernel"), kern)
            _assign(body, (name, dn, "Dense_0", "bias"), bs)

    def fill_cnn(name: str):
        if name not in body:
            return
        layers = src.seq_layers(name)
        conv_names = sorted(
            body[name], key=lambda s: int(s.rsplit("_", 1)[1])
        )
        if len(layers) != len(conv_names):
            raise ValueError(
                f"{name}: torch checkpoint has {len(layers)} Conv layers, "
                f"model expects {len(conv_names)}"
            )
        for cn, (wt, bs) in zip(conv_names, layers):
            _assign(body, (name, cn, "kernel"), wt.transpose(2, 3, 1, 0))
            _assign(body, (name, cn, "bias"), bs)

    def fill_rnn(core_name: str, torch_mod: str):
        """torch nn.LSTM/GRU row-blocked gate tensors → flax per-gate
        Denses inside our scanned RNNCore (models/layers.py RNNCore: params
        at <core>/stack/<lstm|gru>_<layer>/<gate-dense>).

        torch LSTM gate row order: i, f, g, o; both biases are ADDED in
        the cell, and flax's OptimizedLSTMCell carries bias only on the
        hidden-side Dense → sum them there. torch GRU order: r, z, n; for
        r/z the biases add (flax GRUCell biases the input-side Dense); the
        n gate keeps them separate (b_in on 'in', b_hn on 'hn'), exactly
        torch's n = tanh(W_in x + b_in + r*(W_hn h + b_hn))."""
        if core_name not in body:
            return
        stack = body[core_name]["stack"]
        kind = "lstm" if any(k.startswith("lstm_") for k in stack) else "gru"
        for layer in range(len(stack)):
            cell = (core_name, "stack", f"{kind}_{layer}")
            wih = src.take(f"{torch_mod}.weight_ih_l{layer}")
            whh = src.take(f"{torch_mod}.weight_hh_l{layer}")
            bih = src.take(f"{torch_mod}.bias_ih_l{layer}")
            bhh = src.take(f"{torch_mod}.bias_hh_l{layer}")
            hidden = whh.shape[1]

            def chunk(t, gi):
                return t[gi * hidden:(gi + 1) * hidden]

            def in_kernel(w_x):
                # layer 0 of a before_mlp rnn eats the conv flatten →
                # NCHW->NHWC column permutation, like the mlp case
                if layer == 0 and rnn_before_mlp and flat_hw is not None:
                    return _nchw_to_nhwc_columns(w_x, *flat_hw)
                return w_x.T

            if kind == "lstm":
                for gi, g in enumerate("ifgo"):
                    _assign(body, cell + (f"i{g}", "kernel"),
                            in_kernel(chunk(wih, gi)))
                    _assign(body, cell + (f"h{g}", "kernel"),
                            chunk(whh, gi).T)
                    _assign(body, cell + (f"h{g}", "bias"),
                            chunk(bih, gi) + chunk(bhh, gi))
            else:
                for gi, g in enumerate("rzn"):
                    _assign(body, cell + (f"i{g}", "kernel"),
                            in_kernel(chunk(wih, gi)))
                    _assign(body, cell + (f"h{g}", "kernel"),
                            chunk(whh, gi).T)
                    if g == "n":
                        _assign(body, cell + ("in", "bias"), chunk(bih, gi))
                        _assign(body, cell + ("hn", "bias"), chunk(bhh, gi))
                    else:
                        _assign(body, cell + (f"i{g}", "bias"),
                                chunk(bih, gi) + chunk(bhh, gi))

    def fill_rnn_ln(ln_name: str, torch_mod: str):
        """rnn_ln LayerNorm (network_builder.py:274-280): torch
        weight/bias → flax scale/bias."""
        if ln_name not in body:
            return
        _assign(body, (ln_name, "scale"), src.take(f"{torch_mod}.weight"))
        _assign(body, (ln_name, "bias"), src.take(f"{torch_mod}.bias"))

    def fill_impala(name: str, torch_mod: str):
        """Impala tower (A2CResnetBuilder `cnn`, network_builder.py
        ImpalaSequential :675-688): per stage, the downsampling ConvBlock
        + 2 residual blocks × 2 ConvBlocks. With use_bn each ConvBlock's
        Conv2d drops its bias and a BatchNorm2d follows (:599-611) →
        FrozenBatchNorm params (running stats land in mean/var; torch's
        num_batches_tracked counter has no analog and is consumed); with
        use_zero_init each residual block carries an `alpha` scalar
        (:648-649) → the block's `alpha` param."""
        if name not in body:
            return
        use_bn = bool(cnn_cfg.get("use_bn"))
        use_zero_init = bool(cnn_cfg.get("use_zero_init"))
        stages = [k for k in body[name] if k.startswith("ImpalaSequential_")]

        def conv_block(path, tblock):
            """flax <name>/.../ImpalaConvBlock_j <- torch ConvBlock."""
            _assign(body, path + ("Conv_0", "kernel"),
                    src.take(tblock + ".conv.weight").transpose(2, 3, 1, 0))
            if use_bn:
                bn = path + ("FrozenBatchNorm_0",)
                _assign(body, bn + ("scale",), src.take(tblock + ".bn.weight"))
                _assign(body, bn + ("bias",), src.take(tblock + ".bn.bias"))
                _assign(body, bn + ("mean",),
                        src.take(tblock + ".bn.running_mean"))
                _assign(body, bn + ("var",),
                        src.take(tblock + ".bn.running_var"))
                src.take(tblock + ".bn.num_batches_tracked")
            else:
                _assign(body, path + ("Conv_0", "bias"),
                        src.take(tblock + ".conv.bias"))

        for i in range(len(stages)):
            stage = (name, f"ImpalaSequential_{i}")
            tmod = f"{torch_mod}.{i}"
            conv_block(stage + ("ImpalaConvBlock_0",), f"{tmod}.conv")
            for rb, tb in ((0, "res_block1"), (1, "res_block2")):
                block = stage + (f"ImpalaResidualBlock_{rb}",)
                for cj, tc in ((0, "conv1"), (1, "conv2")):
                    conv_block(
                        block + (f"ImpalaConvBlock_{cj}",), f"{tmod}.{tb}.{tc}"
                    )
                if use_zero_init:
                    _assign(body, block + ("alpha",),
                            src.take(f"{tmod}.{tb}.alpha"))

    if cnn_cfg.get("type") == "impala":
        fill_impala("actor_cnn", "a2c_network.cnn")
    else:
        fill_cnn("actor_cnn")
        fill_cnn("critic_cnn")
    fill_mlp("actor_mlp")
    fill_mlp("critic_mlp")
    # shared nets name the core 'rnn'; separate trunks 'a_rnn'/'c_rnn'
    # (network_builder.py:272-280)
    if "actor_rnn" in body:
        shared = "a2c_network.rnn.rnn.weight_ih_l0" in src.sd
        fill_rnn("actor_rnn",
                 "a2c_network.rnn.rnn" if shared else "a2c_network.a_rnn.rnn")
        fill_rnn_ln(
            "actor_rnn_ln",
            "a2c_network.layer_norm" if shared
            else "a2c_network.a_layer_norm",
        )
    fill_rnn("critic_rnn", "a2c_network.c_rnn.rnn")
    fill_rnn_ln("critic_rnn_ln", "a2c_network.c_layer_norm")

    # the NCHW->NHWC flatten permutation lands on the first Linear AFTER
    # the conv stack; with no mlp that Linear is a distribution/value head
    # below, which this importer does not permute — refuse rather than
    # silently mis-load (no reference config pairs a cnn with an empty mlp)
    if flat_hw is not None and not rnn_before_mlp and (
        "actor_mlp" not in body
        or ("critic_cnn" in body and "critic_mlp" not in body)
    ):
        raise NotImplementedError(
            "torch import of a conv torso with no mlp stage: the flatten "
            "permutation would land on a head layer; add an mlp or extend "
            "the importer"
        )

    # named heads: mu / value (continuous); sigma leaf or head
    for head in ("mu", "value"):
        if head in body:
            _assign(
                body, (head, "Dense_0", "kernel"),
                src.take(f"a2c_network.{head}.weight").T,
            )
            _assign(
                body, (head, "Dense_0", "bias"),
                src.take(f"a2c_network.{head}.bias"),
            )
    if "sigma" in body:
        if isinstance(body["sigma"], dict):  # state-dependent sigma head
            _assign(
                body, ("sigma", "Dense_0", "kernel"),
                src.take("a2c_network.sigma.weight").T,
            )
            _assign(
                body, ("sigma", "Dense_0", "bias"),
                src.take("a2c_network.sigma.bias"),
            )
        else:
            _assign(body, ("sigma",), src.take("a2c_network.sigma"))

    # discrete logits: our head modules <- torch 'logits' (single Linear,
    # ours is a top-level 'Dense_0') or 'logits.<i>' (multi-discrete
    # ModuleList, ours are 'logits_<i>')
    logit_heads = sorted(
        (k for k in body if k.startswith(("Dense_", "logits_"))),
        key=lambda s: int(s.rsplit("_", 1)[1]),
    )
    if logit_heads:
        if "a2c_network.logits.weight" in src.sd:
            if len(logit_heads) != 1:
                raise ValueError(
                    "model has multiple logits heads but checkpoint has one"
                )
            _assign(
                body, (logit_heads[0], "Dense_0", "kernel"),
                src.take("a2c_network.logits.weight").T,
            )
            _assign(
                body, (logit_heads[0], "Dense_0", "bias"),
                src.take("a2c_network.logits.bias"),
            )
        else:
            for i, head in enumerate(logit_heads):
                _assign(
                    body, (head, "Dense_0", "kernel"),
                    src.take(f"a2c_network.logits.{i}.weight").T,
                )
                _assign(
                    body, (head, "Dense_0", "bias"),
                    src.take(f"a2c_network.logits.{i}.bias"),
                )

    # normalizers (torch RunningMeanStd <-> ops/running_stats.py)
    new_norm = norm
    if norm is not None:
        import jax.numpy as jnp

        def rms_from(prefix, example):
            return example.replace(
                mean=jnp.asarray(
                    src.take(f"{prefix}.running_mean"), example.mean.dtype
                ),
                var=jnp.asarray(
                    src.take(f"{prefix}.running_var"), example.var.dtype
                ),
                count=jnp.asarray(
                    src.take(f"{prefix}.count"), example.count.dtype
                ),
            )

        if isinstance(getattr(norm, "obs", None), dict) and any(
            k.startswith("running_mean_std.running_mean_std.") for k in sd
        ):
            # dict observations: RunningMeanStdObs ModuleDict
            # (running_mean_std.py:117-128) — one RMS per obs key
            new_norm = new_norm.replace(obs={
                k: rms_from(f"running_mean_std.running_mean_std.{k}", v)
                for k, v in norm.obs.items()
            })
        elif getattr(norm, "obs", None) is not None and (
            "running_mean_std.running_mean" in sd
        ):
            new_norm = new_norm.replace(
                obs=rms_from("running_mean_std", norm.obs)
            )
        if getattr(norm, "value", None) is not None and (
            "value_mean_std.running_mean" in sd
        ):
            new_norm = new_norm.replace(
                value=rms_from("value_mean_std", norm.value)
            )

    # AFTER norm application, so normalizer stats the target model cannot
    # hold (e.g. checkpoint trained with normalize_input: True imported
    # under normalize_input: False) hard-error instead of silently dropping
    leftovers = src.leftovers()
    if leftovers:
        raise ValueError(
            "torch checkpoint tensors with no destination in this model "
            f"(config mismatch?): {leftovers}"
        )

    return params, new_norm


def import_a2c_checkpoint(
    path: str, net_params: Any, norm: Any, network_cfg: dict, input_shape
) -> Tuple[Any, Any]:
    """One-call import: reference .pth → (net_params, norm) for this model."""
    sd = load_torch_state_dict(path)
    return convert_a2c_state_dict(
        sd, net_params, norm, network_cfg, input_shape
    )


# ----------------------------------------------------------------------
# SAC (sac_agent.py get_weights: {'actor', 'critic', 'critic_target',
# 'running_mean_std'?, 'log_alpha'?, ...}; actor = trunk Sequential whose
# LAST Linear is the (mu, log_std) head, network_builder.py:919-944;
# critic = Q1/Q2 Sequentials, :947-969)
# ----------------------------------------------------------------------

def _fill_seq_module(body: dict, layers, trunk_name: str, head_name: str):
    """torch Sequential Linears → our trunk Dense_i + separate head."""
    trunk_layers, head_layer = layers[:-1], layers[-1]
    dense_names = sorted(
        body[trunk_name], key=lambda s: int(s.rsplit("_", 1)[1])
    )
    if len(trunk_layers) != len(dense_names):
        raise ValueError(
            f"{trunk_name}: torch checkpoint has {len(trunk_layers)} trunk "
            f"Linears, model expects {len(dense_names)}"
        )
    for dn, (wt, bs) in zip(dense_names, trunk_layers):
        _assign(body, (trunk_name, dn, "Dense_0", "kernel"), wt.T)
        _assign(body, (trunk_name, dn, "Dense_0", "bias"), bs)
    wt, bs = head_layer
    _assign(body, (head_name, "Dense_0", "kernel"), wt.T)
    _assign(body, (head_name, "Dense_0", "bias"), bs)


def _seq_linears(sd: Dict[str, np.ndarray], prefix: str):
    idxs = sorted({
        int(k[len(prefix):].split(".")[0])
        for k in sd
        if k.startswith(prefix) and k.endswith(".weight")
    })
    if not idxs:
        raise KeyError(f"no '{prefix}*' Linears in the torch checkpoint")
    return [(sd[f"{prefix}{i}.weight"], sd[f"{prefix}{i}.bias"])
            for i in idxs]


def convert_sac_weights(
    raw: dict, actor_params: Any, critic_params: Any,
    critic_target_params: Any = None, obs_rms: Any = None,
):
    """Reference SAC checkpoint sections → our (actor_params,
    critic_params, critic_target_params, obs_rms). `raw` is the loaded
    .pth dict (full-state or get_weights layout)."""
    actor_sd = flatten_state_dict(raw["actor"])
    # keys may carry the 'sac_network.actor.' prefix when saved from the
    # whole model instead of the submodule
    def strip(sd, pre):
        return {
            (k[len(pre):] if k.startswith(pre) else k): v
            for k, v in sd.items()
        }

    actor_sd = strip(actor_sd, "sac_network.actor.")
    new_actor = _to_mutable(actor_params)
    _fill_seq_module(
        new_actor["params"], _seq_linears(actor_sd, "trunk."),
        "trunk", "head",
    )

    def fill_critic(example, sd):
        sd = strip(flatten_state_dict(sd), "sac_network.critic.")
        sd = strip(sd, "sac_network.critic_target.")
        new = _to_mutable(example)
        for q in ("Q1", "Q2"):
            _fill_seq_module(
                new["params"], _seq_linears(sd, f"{q}."),
                f"{q}_trunk", f"{q}_head",
            )
        return new

    # critic_params=None: actor-only conversion (the play path needs no Q)
    new_critic = (
        fill_critic(critic_params, raw["critic"])
        if critic_params is not None else None
    )
    new_target = None
    if critic_target_params is not None and "critic_target" in raw:
        new_target = fill_critic(critic_target_params, raw["critic_target"])

    new_rms = obs_rms
    if obs_rms is None and raw.get("running_mean_std") is not None:
        raise ValueError(
            "torch SAC checkpoint carries running_mean_std stats but this "
            "config has normalize_input: False — the imported policy would "
            "see raw observations; enable normalize_input to import it"
        )
    if obs_rms is not None and raw.get("running_mean_std") is not None:
        import jax.numpy as jnp

        rms_sd = flatten_state_dict(raw["running_mean_std"])
        new_rms = obs_rms.replace(
            mean=jnp.asarray(rms_sd["running_mean"], obs_rms.mean.dtype),
            var=jnp.asarray(rms_sd["running_var"], obs_rms.var.dtype),
            count=jnp.asarray(rms_sd["count"], obs_rms.count.dtype),
        )
    return new_actor, new_critic, new_target, new_rms


def load_torch_checkpoint_raw(path: str) -> dict:
    import torch

    return torch.load(path, map_location="cpu", weights_only=False)
