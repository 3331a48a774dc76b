"""flat_adam (train/optim.py) must match optax.chain(clip, adam) exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from m3l_tpu.train.optim import flat_adam


def _tree(key):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "w": jax.random.normal(k1, (17, 33)),
        "b": jax.random.normal(k2, (33,)),
        "blocks": [
            {"scale": jax.random.normal(k3, (5,))},
            {"kernel": jax.random.normal(k4, (8, 128, 3))},
        ],
    }


@pytest.mark.parametrize("clip", [None, 0.5])
def test_flat_adam_matches_optax(clip):
    params_ref = _tree(jax.random.PRNGKey(0))
    params_flat = jax.tree.map(lambda x: x.copy(), params_ref)

    if clip is None:
        tx_ref = optax.adam(1e-3, eps=1e-5)
    else:
        tx_ref = optax.chain(optax.clip_by_global_norm(clip), optax.adam(1e-3, eps=1e-5))
    tx_flat = flat_adam(1e-3, eps=1e-5, max_grad_norm=clip)

    s_ref = tx_ref.init(params_ref)
    s_flat = tx_flat.init(params_flat)

    key = jax.random.PRNGKey(1)
    for step in range(5):
        key, sub = jax.random.split(key)
        grads = _tree(sub)
        u_ref, s_ref = tx_ref.update(grads, s_ref, params_ref)
        params_ref = optax.apply_updates(params_ref, u_ref)
        u_flat, s_flat = tx_flat.update(grads, s_flat, params_flat)
        params_flat = optax.apply_updates(params_flat, u_flat)
        for a, b in zip(jax.tree.leaves(params_ref), jax.tree.leaves(params_flat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=2e-6)


def test_flat_adam_schedule_and_state_tree():
    sched = optax.linear_schedule(1e-3, 1e-4, transition_steps=10)
    tx = flat_adam(sched)
    params = _tree(jax.random.PRNGKey(2))
    state = tx.init(params)
    # state is an ordinary pytree (KL-freeze masking tree_maps over it)
    frozen = jax.tree.map(lambda x: x, state)
    assert frozen.count.shape == ()
    u, state2 = tx.update(params, state, params)
    assert state2.count == 1
    assert jax.tree.structure(u) == jax.tree.structure(params)

    ref = optax.adam(sched)
    s_ref = ref.init(params)
    u_ref, _ = ref.update(params, s_ref, params)
    for a, b in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=2e-6)


def test_flat_adamw_matches_optax():
    from m3l_tpu.ssl.module import wd_mask
    from m3l_tpu.train.optim import flat_adamw

    lr = optax.linear_schedule(1e-3, 1e-4, transition_steps=10)
    wd = optax.linear_schedule(0.04, 0.02, transition_steps=10)
    params_ref = _tree(jax.random.PRNGKey(2))
    params_flat = jax.tree.map(lambda x: x.copy(), params_ref)

    # the exact construction default_wd_split_optimizer uses (plain
    # optax.adamw does not accept a weight-decay schedule)
    tx_ref = optax.inject_hyperparams(optax.adamw, static_args=("mask", "b1", "b2"))(
        learning_rate=lr, weight_decay=wd, b1=0.9, b2=0.95, eps=1e-8, mask=wd_mask
    )
    tx_flat = flat_adamw(lr, wd, b1=0.9, b2=0.95, eps=1e-8)
    s_ref = tx_ref.init(params_ref)
    s_flat = tx_flat.init(params_flat)

    key = jax.random.PRNGKey(3)
    for step in range(5):
        key, sub = jax.random.split(key)
        grads = _tree(sub)
        u_ref, s_ref = tx_ref.update(grads, s_ref, params_ref)
        params_ref = optax.apply_updates(params_ref, u_ref)
        u_flat, s_flat = tx_flat.update(grads, s_flat, params_flat)
        params_flat = optax.apply_updates(params_flat, u_flat)
        for a, b in zip(jax.tree.leaves(params_ref), jax.tree.leaves(params_flat)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6, rtol=2e-6)
