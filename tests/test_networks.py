"""Network builder + model wrapper tests: shapes, config wiring, RNN
done-masking, init conventions."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rl_games_tpu.models.model_builder import ModelBuilder
from rl_games_tpu.models.network_builder import A2CNetwork
from rl_games_tpu.models import layers as L


def mlp_params(separate=False, space="continuous", fixed_sigma=True, rnn=None,
               units=(32, 16)):
    p = {
        "name": "actor_critic",
        "separate": separate,
        "mlp": {
            "units": list(units),
            "activation": "elu",
            "initializer": {"name": "default"},
        },
    }
    if space == "continuous":
        p["space"] = {
            "continuous": {
                "mu_activation": "None",
                "sigma_activation": "None",
                "mu_init": {"name": "default"},
                "sigma_init": {"name": "const_initializer", "val": 0.0},
                "fixed_sigma": fixed_sigma,
            }
        }
    elif space == "discrete":
        p["space"] = {"discrete": {}}
    elif space == "multi_discrete":
        p["space"] = {"multi_discrete": {}}
    if rnn:
        p["rnn"] = rnn
    return p


def test_continuous_shapes_fixed_sigma():
    net = A2CNetwork.create(mlp_params(), actions_num=4, input_shape=(11,))
    obs = jnp.ones((7, 11))
    params = net.init(jax.random.PRNGKey(0), obs)
    out = net.apply(params, obs)
    assert out["mu"].shape == (7, 4)
    assert out["sigma_raw"].shape == (7, 4)
    assert out["value"].shape == (7, 1)
    # fixed sigma initialized to const 0
    np.testing.assert_allclose(np.asarray(out["sigma_raw"]), 0.0)


def test_separate_trunks_have_distinct_params():
    net = A2CNetwork.create(
        mlp_params(separate=True), actions_num=2, input_shape=(5,)
    )
    obs = jnp.ones((3, 5))
    params = net.init(jax.random.PRNGKey(0), obs)
    names = jax.tree_util.tree_leaves_with_path(params)
    keys = {"/".join(str(p) for p in path) for path, _ in names}
    assert any("actor_mlp" in k for k in keys)
    assert any("critic_mlp" in k for k in keys)


def test_discrete_and_multidiscrete():
    net = A2CNetwork.create(
        mlp_params(space="discrete"), actions_num=6, input_shape=(4,)
    )
    obs = jnp.ones((3, 4))
    params = net.init(jax.random.PRNGKey(0), obs)
    out = net.apply(params, obs)
    assert out["logits"].shape == (3, 6)

    net2 = A2CNetwork.create(
        mlp_params(space="multi_discrete"), actions_num=(3, 5), input_shape=(4,)
    )
    params2 = net2.init(jax.random.PRNGKey(0), obs)
    out2 = net2.apply(params2, obs)
    assert out2["logits"][0].shape == (3, 3)
    assert out2["logits"][1].shape == (3, 5)


@pytest.mark.parametrize("kind", ["lstm", "gru"])
def test_rnn_forward_and_state_shapes(kind):
    rnn = {"name": kind, "units": 24, "layers": 2}
    net = A2CNetwork.create(
        mlp_params(rnn=rnn), actions_num=2, input_shape=(6,)
    )
    num_seqs, seq_len = 4, 8
    obs = jnp.ones((num_seqs * seq_len, 6))
    states = net.get_default_rnn_state(num_seqs)
    assert states[0].shape == (2, num_seqs, 24)
    dones = jnp.zeros((num_seqs * seq_len,))
    params = net.init(
        jax.random.PRNGKey(0), obs, rnn_states=states, dones=dones,
        seq_length=seq_len,
    )
    out = net.apply(params, obs, rnn_states=states, dones=dones, seq_length=seq_len)
    assert out["mu"].shape == (num_seqs * seq_len, 2)
    assert out["rnn_states"][0].shape == (2, num_seqs, 24)


def test_rnn_done_masking_resets_state():
    """A done at step t must make the output at t independent of the past."""
    rnn = {"name": "gru", "units": 8, "layers": 1}
    net = A2CNetwork.create(mlp_params(rnn=rnn, units=(8,)), actions_num=1,
                            input_shape=(3,))
    num_seqs, seq_len = 1, 6
    rng = np.random.default_rng(0)
    obs = jnp.asarray(rng.normal(size=(seq_len, 3)), jnp.float32)
    states = net.get_default_rnn_state(num_seqs)
    params = net.init(jax.random.PRNGKey(0), obs, rnn_states=states,
                      seq_length=seq_len)

    # run with a done at t=3
    dones = jnp.asarray([0, 0, 0, 1, 0, 0], jnp.float32)
    out_a = net.apply(params, obs, rnn_states=states, dones=dones,
                      seq_length=seq_len)
    # run only the suffix from t=3 with fresh state
    out_b = net.apply(params, obs[3:], rnn_states=states, dones=jnp.zeros(3),
                      seq_length=3)
    np.testing.assert_allclose(
        np.asarray(out_a["mu"][3:]), np.asarray(out_b["mu"]), rtol=1e-5, atol=1e-6
    )
    # and WITHOUT the done they differ (state carried over)
    out_c = net.apply(params, obs, rnn_states=states, dones=jnp.zeros(6),
                      seq_length=seq_len)
    assert not np.allclose(np.asarray(out_c["mu"][3:]), np.asarray(out_b["mu"]))


def test_cnn_torso():
    p = mlp_params(units=(32,))
    p["cnn"] = {
        "type": "conv2d",
        "activation": "relu",
        "initializer": {"name": "glorot_normal_initializer"},
        "convs": [
            {"filters": 8, "kernel_size": 3, "strides": 2, "padding": 1},
            {"filters": 16, "kernel_size": 3, "strides": 2, "padding": 0},
        ],
    }
    net = A2CNetwork.create(p, actions_num=4, input_shape=(16, 16, 3))
    obs = jnp.ones((2, 16, 16, 3))
    params = net.init(jax.random.PRNGKey(0), obs)
    out = net.apply(params, obs)
    assert out["mu"].shape == (2, 4)


def test_impala_torso():
    p = mlp_params(space="discrete", units=(64,))
    p["cnn"] = {"type": "impala", "conv_depths": [4, 8]}
    net = A2CNetwork.create(p, actions_num=5, input_shape=(16, 16, 1))
    obs = jnp.ones((2, 16, 16, 1))
    params = net.init(jax.random.PRNGKey(0), obs)
    out = net.apply(params, obs)
    assert out["logits"].shape == (2, 5)


def test_d2rl_mlp():
    p = mlp_params()
    p["mlp"]["d2rl"] = True
    net = A2CNetwork.create(p, actions_num=2, input_shape=(7,))
    obs = jnp.ones((3, 7))
    params = net.init(jax.random.PRNGKey(0), obs)
    out = net.apply(params, obs)
    assert out["mu"].shape == (3, 2)


def test_state_dependent_sigma_const_init_writes_bias():
    """network_builder.py:14-26: const sigma_init zeroes weights, sets bias."""
    p = mlp_params(fixed_sigma=False)
    p["space"]["continuous"]["sigma_init"] = {
        "name": "const_initializer", "val": -1.5,
    }
    net = A2CNetwork.create(p, actions_num=3, input_shape=(5,))
    obs = jnp.asarray(np.random.default_rng(1).normal(size=(4, 5)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), obs)
    out = net.apply(params, obs)
    np.testing.assert_allclose(np.asarray(out["sigma_raw"]), -1.5, rtol=1e-6)


def test_model_builder_logstd_train_and_play():
    params = {
        "model": {"name": "continuous_a2c_logstd"},
        "network": mlp_params(),
    }
    model = ModelBuilder().load(
        params,
        actions_num=3,
        input_shape=(8,),
        normalize_input=True,
        normalize_value=True,
    )
    obs = jnp.asarray(np.random.default_rng(2).normal(size=(6, 8)), jnp.float32)
    net_params, norm = model.init(jax.random.PRNGKey(0), obs)
    play = model.forward_play(net_params, norm, jax.random.PRNGKey(1), obs)
    assert play["actions"].shape == (6, 3)
    train = model.forward_train(net_params, norm, obs, play["actions"])
    assert train["prev_neglogp"].shape == (6,)
    # train-mode neglogp of the sampled action == play-mode neglogpacs
    np.testing.assert_allclose(
        np.asarray(train["prev_neglogp"]), np.asarray(play["neglogpacs"]),
        rtol=1e-5, atol=1e-5,
    )
    assert train["entropy"].shape == (6,)
    kl = model.kl(play["mus"], play["sigmas"], train["mus"], train["sigmas"])
    np.testing.assert_allclose(np.asarray(kl), 0.0, atol=1e-6)


def test_discrete_model_action_masking():
    params = {
        "model": {"name": "discrete_a2c"},
        "network": mlp_params(space="discrete"),
    }
    model = ModelBuilder().load(params, actions_num=4, input_shape=(8,))
    obs = jnp.ones((5, 8))
    net_params, norm = model.init(jax.random.PRNGKey(0), obs)
    mask = jnp.asarray(np.tile([1, 0, 1, 0], (5, 1)))
    play = model.forward_play(
        net_params, norm, jax.random.PRNGKey(3), obs, action_masks=mask
    )
    assert set(np.asarray(play["actions"]).tolist()) <= {0, 2}


def test_torch_default_init_scale():
    """default Dense init ~ U(+-1/sqrt(fan_in)) like torch Linear."""
    dense = L.Dense(64)
    params = dense.init(jax.random.PRNGKey(0), jnp.ones((1, 100)))
    kernel = np.asarray(jax.tree_util.tree_leaves(params)[1])
    if kernel.ndim != 2:
        kernel = np.asarray(jax.tree_util.tree_leaves(params)[0])
    bound = 1.0 / np.sqrt(100)
    assert np.abs(kernel).max() <= bound + 1e-6
    assert np.abs(kernel).max() > bound * 0.9


def test_default_initializer_zeroes_all_biases():
    """The reference's init loop zeroes EVERY Linear bias regardless of the
    configured initializer — 'default' only keeps the torch weight init
    (network_builder.py:330-338); the builder net must match."""
    net = A2CNetwork.create(
        mlp_params(separate=True), actions_num=3, input_shape=(8,)
    )
    params = net.init(
        jax.random.PRNGKey(0), jnp.ones((2, 8), jnp.float32)
    )

    found = []

    def check(path, leaf):
        if getattr(path[-1], "key", None) == "bias":
            found.append(path)
            assert float(np.abs(np.asarray(leaf)).max()) == 0.0, path
        return leaf

    jax.tree_util.tree_map_with_path(check, params)
    assert len(found) >= 6  # actor/critic trunks + value + mu heads


def test_tanh_model_train_play_consistency():
    """'continuous_a2c_tanh' (Brax-style NormalTanh policy)."""
    params = {
        "model": {"name": "continuous_a2c_tanh"},
        "network": mlp_params(),
    }
    from rl_games_tpu.models.model_builder import ModelBuilder

    model = ModelBuilder().load(params, actions_num=3, input_shape=(8,))
    obs = jnp.asarray(np.random.default_rng(0).normal(size=(6, 8)), jnp.float32)
    net_params, norm = model.init(jax.random.PRNGKey(0), obs)
    play = model.forward_play(net_params, norm, jax.random.PRNGKey(1), obs)
    assert np.abs(np.asarray(play["actions"])).max() <= 1.0  # tanh-squashed
    train = model.forward_train(net_params, norm, obs, play["actions"],
                                entropy_key=jax.random.PRNGKey(9))
    np.testing.assert_allclose(
        np.asarray(train["prev_neglogp"]), np.asarray(play["neglogpacs"]),
        rtol=1e-3, atol=1e-3,
    )
    det = model.forward_play(
        net_params, norm, jax.random.PRNGKey(2), obs, deterministic=True
    )
    np.testing.assert_allclose(
        np.asarray(det["actions"]), np.tanh(np.asarray(det["mus"])), rtol=1e-5
    )


def test_impala_attention_and_extras():
    """SE-attention impala blocks + reward/last-action RNN inputs
    (A2CResnetBuilder, network_builder.py:643-672, 729-820)."""
    import jax
    import jax.numpy as jnp
    from rl_games_tpu.models.network_builder import A2CNetwork

    net = A2CNetwork.create(
        {
            "name": "resnet_actor_critic", "separate": False,
            "cnn": {"type": "impala", "conv_depths": [8, 16],
                    "use_attention": True},
            "mlp": {"units": [32], "activation": "relu",
                    "initializer": {"name": "default"}},
            "rnn": {"name": "gru", "units": 32, "layers": 1},
            "require_rewards": True,
            "require_last_actions": True,
            "space": {"discrete": {}},
        },
        actions_num=4,
        input_shape=(16, 16, 3),
        value_size=1,
    )
    obs = {
        "observation": jnp.zeros((2, 16, 16, 3)),
        "reward": jnp.zeros((2,)),
        "last_action": jnp.zeros((2,), jnp.int32),
    }
    states = net.get_default_rnn_state(2)
    params = net.init(jax.random.PRNGKey(0), obs, rnn_states=states)
    out = net.apply(params, obs, rnn_states=states, seq_length=1)
    assert out["logits"].shape == (2, 4)
    # attention params exist
    names = str(jax.tree_util.tree_structure(params))
    assert "ChannelAttention_0" in names or "fc1" in names


def test_noisy_linear():
    """Both reference NoisyNet layers (algos_torch/layers.py):
    NoisyLinear = independent per-element noise with sigma_init 0.017 and
    U(±sqrt(3/fan_in)) mu init; NoisyFactorizedLinear = sign-sqrt rank-1
    noise with sigma_init sigma_zero/sqrt(fan_in)."""
    import jax
    import jax.numpy as jnp
    from rl_games_tpu.models.layers import NoisyFactorizedLinear, NoisyLinear

    x = jnp.ones((3, 4))
    for cls, sig_expect in ((NoisyLinear, 0.017),
                            (NoisyFactorizedLinear, 0.4 / 2.0)):
        layer = cls(8)
        params = layer.init(jax.random.PRNGKey(0), x)
        leaf = params["params"]["sigma_w"]
        np.testing.assert_allclose(np.asarray(leaf), sig_expect, rtol=1e-6)
        det = layer.apply(params, x)
        n1 = layer.apply(params, x, noise_key=jax.random.PRNGKey(1))
        n2 = layer.apply(params, x, noise_key=jax.random.PRNGKey(2))
        assert det.shape == (3, 8)
        assert not np.allclose(np.asarray(n1), np.asarray(n2))
        assert not np.allclose(np.asarray(det), np.asarray(n1))
    # independent-noise layer: noise is NOT rank-1 (factorized would be)
    layer = NoisyLinear(8)
    params = layer.init(jax.random.PRNGKey(0), x)
    e = jnp.eye(4)
    w_noisy = np.asarray(layer.apply(params, e, noise_key=jax.random.PRNGKey(3))
                         - layer.apply(params, e))
    assert np.linalg.matrix_rank(w_noisy, tol=1e-5) > 1
