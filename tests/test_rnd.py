"""RND curiosity tests (models/rnd.py + rnd_config in algos/ppo.py).

The reference registers 'rnd_curiosity' (model_builder.py:23) whose class
is absent from its tree — instantiating it crashes the reference itself —
but its config zoo still carries the schema
(configs/smac/v1/3m_torch_sparse.yaml:58-78). These tests pin a WORKING
implementation of that schema."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from rl_games_tpu.models.rnd import RNDCuriosity
from test_ppo import cartpole_params


RND_NETWORK = {
    "name": "rnd_curiosity",
    "mlp": {
        "rnd": {"units": [64, 32, 16]},
        "net": {"units": [32, 32]},
        "activation": "elu",
        "initializer": {"name": "default"},
    },
}


def test_rnd_predictor_learns_seen_obs_down():
    """Training the predictor on a batch drives its error down on that
    batch while NOVEL observations keep a higher error — the RND
    exploration signal."""
    rnd = RNDCuriosity(RND_NETWORK)
    key = jax.random.PRNGKey(0)
    seen = jax.random.normal(jax.random.PRNGKey(1), (256, 8))
    novel = 5.0 + jax.random.normal(jax.random.PRNGKey(2), (256, 8))
    target, pred = rnd.init(key, seen)
    tx = optax.adam(1e-3)
    opt = tx.init(pred)

    before_seen = float(jnp.mean(rnd.intrinsic(target, pred, seen)))

    @jax.jit
    def step(pred, opt):
        loss, grads = jax.value_and_grad(rnd.loss)(pred, target, seen)
        updates, opt = tx.update(grads, opt, pred)
        return optax.apply_updates(pred, updates), opt, loss

    for _ in range(300):
        pred, opt, loss = step(pred, opt)

    after_seen = float(jnp.mean(rnd.intrinsic(target, pred, seen)))
    after_novel = float(jnp.mean(rnd.intrinsic(target, pred, novel)))
    assert after_seen < 0.2 * before_seen
    assert after_novel > 3.0 * after_seen


def test_ppo_with_rnd_config_trains_and_reports_loss():
    """rnd_config end-to-end: the smac-sparse schema parses, the intrinsic
    reward enters the epoch, losses/rnd_loss is reported and decreases as
    the state distribution stabilizes, and CartPole still trains."""
    from rl_games_tpu.algos.ppo import PPOAgent
    from test_ppo import run_epochs

    params = cartpole_params()
    params["config"]["rnd_config"] = {
        "scale_value": 0.02,
        "mini_epochs": 2,
        "minibatch_size": 256,
        "learning_rate": 5e-4,
        "network": RND_NETWORK,
    }
    agent = PPOAgent("t", params)
    assert agent.rnd is not None
    state = agent.init_state()
    fn = agent.make_train_fn(donate=False)
    state, m1 = fn(state)
    assert "rnd_loss" in m1 and np.isfinite(float(m1["rnd_loss"]))
    first = float(m1["rnd_loss"])
    m = m1
    for _ in range(59):
        state, m = fn(state)
    assert float(m["rnd_loss"]) < first  # predictor catches up
    assert float(m["mean_rewards"][0]) > 60.0  # still learns the task


def test_rnd_vmaps_under_multiseed():
    """RND state fields ride the TrainState pytree, so --seeds works."""
    from rl_games_tpu.algos.ppo import PPOAgent
    from rl_games_tpu.utils.multiseed import MultiSeedTrainer

    params = cartpole_params()
    params["config"]["rnd_config"] = {
        "scale_value": 0.02,
        "network": RND_NETWORK,
    }
    agent = PPOAgent("t", params)
    ms = MultiSeedTrainer(agent, [1, 2])
    stacked = ms.init_state()
    fn = ms.make_train_fn(donate=False)
    stacked, m = fn(stacked)
    assert m["rnd_loss"].shape == (2,)
