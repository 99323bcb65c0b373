"""Training core tests: SGHMC algebra, adaptive clip, the jitted trainer on
the minimum end-to-end slice (pointwise MLP regression, float32), and
checkpoint round trips."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from qbn_tpu.config import Config
from qbn_tpu.data import get_train_loaders, get_test_loader
from qbn_tpu.models.factory import build_model
from qbn_tpu.training.optim import build_optimizer, \
    clip_by_adaptive_global_norm
from qbn_tpu.training.sghmc import sghmc
from qbn_tpu.training.trainer import Trainer
from qbn_tpu.training.checkpoint import (
    save_variables, load_variables, checkpoint_path, list_snapshots,
)
from qbn_tpu.utils import init_variables

KEY = jax.random.PRNGKey(0)


def test_sghmc_update_algebra():
    """One deterministic-ish step must follow the reference update law
    (reference: utils_sgld.py:54-90): with fresh state and no resampling,
    v = -lr^2*V^-1/2*d_p - C*v + noise and p += v."""
    tx = sghmc(learning_rate=0.1, burnin_steps=0,
               resample_momentum_every=10 ** 9,
               resample_prior_every=10 ** 9, base_c=0.05, gauss_sig=0.1)
    params = {"w": jnp.ones((4,))}
    grads = {"w": jnp.full((4,), 0.5)}
    state = tx.init(params)
    # count=0 triggers both resamples (iteration 0 % n == 0 in reference);
    # use large periods and step twice to land on a no-resample step.
    upd1, state = tx.update(grads, state, params)
    params1 = jax.tree.map(lambda p, u: p + u, params, upd1)
    upd2, state2 = tx.update(grads, state, params1)
    # second step: no resampling; mom evolves per the law with updated V_hat
    lr, c = 0.1, 0.05
    wd = float(state.weight_decay["w"])
    d_p = np.asarray(grads["w"]) + wd * np.asarray(params1["w"])
    v_hat = np.asarray(state2.v_hat["w"])  # post-burnin(0 steps): unchanged
    v_inv_sqrt = 1.0 / (np.sqrt(v_hat) + 1e-6)
    det_part = -(lr ** 2) * v_inv_sqrt * d_p - c * np.asarray(
        state.momentum["w"])
    # noise has std sqrt(2 lr^2 v^-1/2 c - lr^4) ~ 0.03; deterministic part
    # dominates, so check the update is within a few noise sigmas.
    noise_std = np.sqrt(np.maximum(
        2 * lr ** 2 * v_inv_sqrt * c - lr ** 4, 1e-16))
    resid = np.asarray(upd2["w"]) - (np.asarray(state.momentum["w"])
                                     + det_part)
    assert np.all(np.abs(resid) < 6 * noise_std + 1e-6)
    assert np.all(np.isfinite(np.asarray(upd2["w"])))


def test_sghmc_prior_resample_changes_weight_decay():
    tx = sghmc(learning_rate=0.01, burnin_steps=10,
               resample_momentum_every=1, resample_prior_every=1)
    params = {"w": jnp.ones((100,))}
    state = tx.init(params)
    wd0 = float(state.weight_decay["w"])
    _, state = tx.update({"w": jnp.zeros((100,))}, state, params)
    wd1 = float(state.weight_decay["w"])
    assert wd1 != wd0 and wd1 > 0
    # Gamma(alpha0 + n/2, beta0 + |p|^2/2): mean ~ alpha/beta = 60/60 = 1
    assert 0.1 < wd1 < 5.0


def test_sghmc_no_key_reuse_across_updates(monkeypatch):
    """Regression: every PRNG key consumed by two consecutive updates must
    be distinct. Round 1 derived prior keys from a second split of the
    carried rng, making step-t prior keys == step-(t+1) momentum keys."""
    seen = []
    real_normal, real_gamma = jax.random.normal, jax.random.gamma

    def rec_normal(key, *a, **k):
        seen.append(tuple(np.asarray(jax.random.key_data(key)).ravel()))
        return real_normal(key, *a, **k)

    def rec_gamma(key, *a, **k):
        seen.append(tuple(np.asarray(jax.random.key_data(key)).ravel()))
        return real_gamma(key, *a, **k)

    monkeypatch.setattr(jax.random, "normal", rec_normal)
    monkeypatch.setattr(jax.random, "gamma", rec_gamma)

    tx = sghmc(learning_rate=0.01, burnin_steps=10,
               resample_momentum_every=1, resample_prior_every=1)
    params = {"w": jnp.ones((8,)), "b": jnp.ones((3,)),
              "c": jnp.ones((2, 2))}
    grads = jax.tree.map(jnp.zeros_like, params)
    state = tx.init(params)
    _, state = tx.update(grads, state, params)
    _, state = tx.update(grads, state, params)
    # 3 leaves x 3 draws (mom, noise, prior) x 2 updates = 18 unique keys
    assert len(seen) == 18
    assert len(set(seen)) == 18, "PRNG key issued twice across updates"


def test_eval_keys_differ_across_splits():
    """Regression: evaluate_with_loader must not issue identical per-batch
    keys for different splits (round 1: train/valid/test all used salt 0)."""
    import zlib
    base = jax.random.PRNGKey(1 + 1234)
    keys = {}
    for salt in ("train", "valid", "test", "random", "rotation0"):
        k = jax.random.fold_in(base, zlib.crc32(salt.encode()) & 0x7FFFFFFF)
        keys[salt] = tuple(np.asarray(
            jax.random.key_data(jax.random.fold_in(k, 0))).ravel())
    assert len(set(keys.values())) == len(keys)


def test_adaptive_clip_threshold_moves():
    tx = clip_by_adaptive_global_norm(window=8, std_mul=2.0)
    grads = {"w": jnp.ones((4,))}
    state = tx.init(grads)
    for _ in range(10):
        out, state = tx.update(grads, state)
    # buffer full of identical norms -> threshold ~ mean = 2.0
    assert np.isclose(float(state.max_grad), 2.0, atol=1e-3)
    big = {"w": jnp.full((4,), 100.0)}
    clipped, state2 = tx.update(big, state)
    assert float(optax_global_norm(clipped)) <= float(state.max_grad) + 1e-3
    # rejected norm is not stored
    assert int(state2.count) == int(state.count)


def optax_global_norm(tree):
    import optax
    return optax.global_norm(tree)


def _train_slice(cfg, n_epochs=3):
    model = build_model(cfg)
    train_loader, valid_loader = get_train_loaders(cfg)
    tx, _ = build_optimizer(cfg, len(train_loader))
    trainer = Trainer(model, cfg, tx, mode="float", train_loader=train_loader,
                      valid_loader=valid_loader)
    x0, _ = next(iter(train_loader))
    variables = init_variables(model, KEY, jnp.asarray(x0))
    state = trainer.init_state(variables, jax.random.PRNGKey(cfg.seed))
    hist = []
    for _ in range(n_epochs):
        state, m = trainer.train_epoch(state)
        hist.append(m)
    return trainer, state, hist


def test_end_to_end_regression_slice(tmp_path):
    """Minimum end-to-end slice: pointwise MLP on synthetic regression —
    loss must fall and RMSE reach sanity level."""
    cfg = Config(task="regression", model="linear",
                 dataset="regression_synthetic", learning_rate=1e-2,
                 epochs=3, batch_size=100, gamma=0.0, optimizer="adam",
                 valid_portion=0.2, save=str(tmp_path), seed=1,
                 lr_schedule="constant")
    trainer, state, hist = _train_slice(cfg, n_epochs=5)
    assert hist[-1]["obj"] < hist[0]["obj"]
    assert hist[-1]["rmse"] < hist[0]["rmse"]
    _, test_m = trainer.eval_epoch(state, get_test_loader(cfg))
    assert np.isfinite(test_m["nll"])


def test_bbb_regression_slice(tmp_path):
    cfg = Config(task="regression", model="linear_bbb",
                 dataset="regression_synthetic", learning_rate=1e-2,
                 epochs=2, batch_size=100, gamma=1.0, sigma_prior=1.0,
                 optimizer="adam", valid_portion=0.2, save=str(tmp_path),
                 lr_schedule="constant", loss_scaling="batch")
    trainer, state, hist = _train_slice(cfg, n_epochs=4)
    assert hist[-1]["obj"] < hist[0]["obj"]
    assert hist[0]["kl"] > 0  # ELBO actually sees the KL


def test_sghmc_regression_slice(tmp_path):
    # burn-in spans the whole short run: the preconditioner keeps adapting,
    # as in the reference's 200-of-300-epoch burn-in regime
    cfg = Config(task="regression", model="linear_sgld",
                 dataset="regression_synthetic", learning_rate=1e-2,
                 epochs=4, batch_size=128, gamma=0.0, optimizer="sghmc",
                 loss_scaling="whole", loss_multiplier=2.0,
                 valid_portion=0.2, burnin_epochs=4,
                 resample_momentum_iterations=50,
                 resample_prior_iterations=50, save=str(tmp_path),
                 samples=2, lr_schedule="constant")
    trainer, state, hist = _train_slice(cfg, n_epochs=4)
    assert np.isfinite(hist[-1]["obj"])
    assert np.isfinite(hist[-1]["rmse"])
    # the heteroscedastic objective falls sharply over the burn-in
    assert hist[-1]["obj"] < 0.5 * hist[0]["obj"]


def test_train_loop_checkpoints_and_snapshots(tmp_path):
    cfg = Config(task="regression", model="linear_sgld",
                 dataset="regression_synthetic", learning_rate=1e-2,
                 epochs=6, batch_size=128, gamma=0.0, optimizer="sghmc",
                 loss_scaling="whole", valid_portion=0.2, burnin_epochs=2,
                 samples=2, save=str(tmp_path), lr_schedule="constant",
                 resample_momentum_iterations=50,
                 resample_prior_iterations=50)
    model = build_model(cfg)
    train_loader, valid_loader = get_train_loaders(cfg)
    tx, _ = build_optimizer(cfg, len(train_loader))
    trainer = Trainer(model, cfg, tx, mode="float",
                      train_loader=train_loader, valid_loader=valid_loader)
    x0, _ = next(iter(train_loader))
    variables = init_variables(model, KEY, jnp.asarray(x0))
    state = trainer.init_state(variables, KEY)
    state, best = trainer.train_loop(state)
    # epoch-stamped SGHMC snapshots exist (epochs 2 and 4 qualify)
    snaps = list_snapshots(str(tmp_path))
    assert len(snaps) >= 2
    # round trip
    restored = load_variables(trainer.variables(state), snaps[-1])
    assert set(restored.keys()) == set(trainer.variables(state).keys())


def test_sghmc_guard_skips_diverged_snapshots(tmp_path, monkeypatch):
    """sghmc_guard > 0 (framework extra, default off) skips posterior
    snapshots while the validation key metric sits above best-so-far +
    guard — a chain that hops to a bad mode late cannot fill the
    ensemble with diverged members (observed in the round-3 campaign:
    train error 0.002 -> 0.9 at epoch 90/100). guard == 0 preserves the
    reference snapshot rule exactly."""
    from qbn_tpu.training.trainer import Trainer as T

    def run(guard, vals, tmpdir):
        os.makedirs(tmpdir, exist_ok=True)
        cfg = Config(task="regression", model="linear_sgld",
                     dataset="regression_synthetic", learning_rate=1e-2,
                     epochs=6, batch_size=128, gamma=0.0,
                     optimizer="sghmc", loss_scaling="whole",
                     valid_portion=0.2, burnin_epochs=2, samples=2,
                     save=str(tmpdir), lr_schedule="constant",
                     resample_momentum_iterations=50,
                     resample_prior_iterations=50, sghmc_guard=guard)
        model = build_model(cfg)
        train_loader, valid_loader = get_train_loaders(cfg)
        tx, _ = build_optimizer(cfg, len(train_loader))
        trainer = Trainer(model, cfg, tx, mode="float",
                          train_loader=train_loader,
                          valid_loader=valid_loader)
        monkeypatch.setattr(
            T, "eval_epoch",
            lambda self, state, loader, seed=0:
                (state, {"rmse": vals[self.epoch], "nll": 0.0}))
        x0, _ = next(iter(train_loader))
        variables = init_variables(model, KEY, jnp.asarray(x0))
        state = trainer.init_state(variables, KEY)
        trainer.train_loop(state)
        return list_snapshots(str(tmpdir))

    # epochs 2 and 4 are snapshot epochs; validation diverges at epoch 3+
    vals = [0.10, 0.10, 0.10, 5.0, 5.0, 5.0]
    guarded = run(0.5, vals, tmp_path / "guarded")
    assert len(guarded) == 1 and "_2" in os.path.basename(guarded[0])
    # guard off -> reference behaviour: both snapshot epochs hit disk
    unguarded = run(0.0, vals, tmp_path / "unguarded")
    assert len(unguarded) == 2


def test_deferred_save_last_matches_per_epoch(tmp_path, monkeypatch):
    """save_last checkpointing is deferred (periodic flush + final save);
    the final file must be byte-identical to the per-epoch reference
    behaviour (QBN_CKPT_FLUSH=1), and a plain checkpoint must exist even
    when the flush interval exceeds the epoch count."""
    files = {}
    for flush in ("1", "1000"):
        d = tmp_path / f"flush{flush}"
        d.mkdir()
        monkeypatch.setenv("QBN_CKPT_FLUSH", flush)
        cfg = Config(task="regression", model="linear",
                     dataset="regression_synthetic", learning_rate=1e-2,
                     epochs=3, batch_size=100, gamma=0.0, optimizer="adam",
                     valid_portion=0.2, save=str(d), seed=1,
                     lr_schedule="constant")
        model = build_model(cfg)
        train_loader, valid_loader = get_train_loaders(cfg)
        tx, _ = build_optimizer(cfg, len(train_loader))
        trainer = Trainer(model, cfg, tx, mode="float",
                          train_loader=train_loader,
                          valid_loader=valid_loader)
        x0, _ = next(iter(train_loader))
        variables = init_variables(model, KEY, jnp.asarray(x0))
        state = trainer.init_state(variables, jax.random.PRNGKey(cfg.seed))
        trainer.train_loop(state)
        files[flush] = open(checkpoint_path(str(d)), "rb").read()
    assert files["1"] == files["1000"]


def test_checkpoint_partial_restore(tmp_path):
    """Float checkpoint loads into a quantised model (key intersection)."""
    cfg = Config(model="linear", task="regression",
                 dataset="regression_synthetic")
    model_f = build_model(cfg)
    x = jnp.ones((4, 1))
    v_f = init_variables(model_f, KEY, x)
    path = os.path.join(tmp_path, "w.msgpack")
    save_variables(v_f, path)

    cfg_q = cfg.replace(at=True, q=True)
    model_q = build_model(cfg_q)
    v_q = init_variables(model_q, KEY, x, quantized=True)
    v_q2 = load_variables(v_q, path)
    np.testing.assert_allclose(
        np.asarray(v_q2["params"]["dense_0"]["kernel"]),
        np.asarray(v_f["params"]["dense_0"]["kernel"]))
    assert "quant" in v_q2 and "qconst" in v_q2


def test_nan_step_skip_covers_mutable_stats():
    """A non-finite batch must not poison BN running stats / observer
    EMAs: the step-skip restores params AND the mutable collections.
    (Round-5 finding: one overflowing batch on the sgld-cifar a7w4
    per-snapshot-QAT leg permanently NaN'd a member's batch_stats even
    though params were restored, collapsing the INT ensemble.)"""
    from qbn_tpu.training.trainer import (TrainState, make_train_step,
                                          _metrics_init)

    cfg = Config(model="conv_resnet", dataset="cifar", output_size=10,
                 input_size=(32, 32, 3), q=True, at=True, batch_size=8,
                 optimizer="sgd", lr_schedule="constant",
                 learning_rate=1e-2)
    model = build_model(cfg)
    tx, _ = build_optimizer(cfg, 10)
    x = jax.random.uniform(KEY, (8, 32, 32, 3))
    y = jnp.zeros((8,), jnp.int32)
    variables = init_variables(model, KEY, x, quantized=True)
    state = TrainState(
        params=variables["params"],
        model_state={k: v for k, v in variables.items() if k != "params"},
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32), rng=jax.random.PRNGKey(1))
    step = make_train_step(model, cfg, tx, "qat", 10, 80)

    x_bad = x.at[0, 0, 0, 0].set(jnp.inf)
    s_bad, _, logs = step(state, _metrics_init("classification"), x_bad, y)
    assert not np.isfinite(float(logs["obj"]))
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(s_bad.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for col in ("batch_stats", "quant"):
        for a, b in zip(jax.tree.leaves(state.model_state[col]),
                        jax.tree.leaves(s_bad.model_state[col])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                          err_msg=col)
        # (no blanket finiteness check: fresh observers legitimately
        # hold +/-inf min/max init sentinels)

    # a clean batch after the skipped one trains normally
    s_ok, _, logs2 = step(s_bad, _metrics_init("classification"), x, y)
    assert np.isfinite(float(logs2["obj"]))
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(s_bad.params),
                        jax.tree.leaves(s_ok.params)))
    assert changed
