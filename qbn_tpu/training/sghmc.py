"""Adaptive stochastic-gradient HMC as an optax gradient transformation.

Algorithmic equivalent of the reference's SGLD optimiser (which actually
implements scale-adapted SGHMC, Chen et al. 2014;
reference: src/models/stochastic/sgld/utils_sgld.py:5-92), redesigned as a
pure, jittable transform:

  * per-parameter preconditioner state (tau, g, V_hat) adapted during
    burn-in;
  * momentum resampling every `resample_momentum_every` steps from
    N(0, lr^2 * V^-1/2);
  * Gaussian-prior precision resampled every `resample_prior_every` steps
    from a Gamma(alpha0 + n/2, beta0 + ||p||^2/2) posterior — drawn on
    device with jax.random.gamma instead of the reference's host-side
    numpy.random.gamma;
  * friction base_C with injected noise of variance
    2*lr^2*V^-1/2*C - lr^4, floored at 1e-16;
  * NaN/inf momentum scrubbing.

Burn-in and resampling conditions are data-independent functions of the step
counter, evaluated with jnp.where — no host round trips inside jit.
"""

from __future__ import annotations

from typing import NamedTuple, Callable, Union

import jax
import jax.numpy as jnp
import optax

EPS = 1e-6


class SGHMCState(NamedTuple):
    count: jnp.ndarray          # step counter
    rng: jax.Array              # PRNG key threaded through updates
    tau: optax.Params           # per-param adaptation window
    g: optax.Params             # per-param smoothed gradient
    v_hat: optax.Params         # per-param gradient second moment
    momentum: optax.Params
    weight_decay: optax.Params  # per-param-tensor prior precision (scalar)


def sghmc(
    learning_rate: Union[float, Callable],
    burnin_steps: int,
    resample_momentum_every: int,
    resample_prior_every: int,
    base_c: float = 0.05,
    gauss_sig: float = 0.1,
    alpha0: float = 10.0,
    beta0: float = 10.0,
    seed: int = 0,
) -> optax.GradientTransformation:
    """Build the SGHMC transform. Requires params passed to update()."""
    if gauss_sig == 0:
        init_wd = 0.0
    else:
        init_wd = 1.0 / (gauss_sig ** 2)
    if init_wd <= 0.0:
        raise ValueError(f"Invalid weight_decay value: {init_wd}")
    if base_c < 0:
        raise ValueError(f"Invalid friction term: {base_c}")

    def lr_at(count):
        if callable(learning_rate):
            return learning_rate(count)
        return jnp.asarray(learning_rate, jnp.float32)

    def init(params):
        ones = jax.tree.map(jnp.ones_like, params)
        return SGHMCState(
            count=jnp.zeros((), jnp.int32),
            rng=jax.random.PRNGKey(seed),
            tau=ones,
            g=ones,
            v_hat=jax.tree.map(jnp.ones_like, params),
            momentum=jax.tree.map(jnp.zeros_like, params),
            weight_decay=jax.tree.map(
                lambda p: jnp.asarray(init_wd, jnp.float32), params),
        )

    def update(grads, state, params):
        if params is None:
            raise ValueError("sghmc requires params")
        count = state.count
        lr = lr_at(count).astype(jnp.float32)
        burn_in = count < burnin_steps
        do_mom = (count % resample_momentum_every) == 0
        do_prior = (count % resample_prior_every) == 0

        leaves, treedef = jax.tree.flatten(params)
        n_leaves = len(leaves)
        # One split issues every key for this update plus the carried rng.
        # (jax.random.split(k, n)[i] does not depend on n, so deriving the
        # prior keys from a second split of the carried key would make them
        # bit-identical to the next step's momentum keys.)
        rng, *keys = jax.random.split(state.rng, 3 * n_leaves + 1)
        mom_keys = jax.tree.unflatten(treedef, keys[:n_leaves])
        noise_keys = jax.tree.unflatten(treedef,
                                        keys[n_leaves:2 * n_leaves])
        prior_keys = jax.tree.unflatten(treedef, keys[2 * n_leaves:])

        def leaf(p, grad, tau, g, v_hat, mom, wd, km, kn, kp):
            # prior precision resample: Gamma(alpha0 + n/2, beta) / beta
            alpha = alpha0 + p.size / 2.0
            beta = beta0 + 0.5 * jnp.sum(p * p)
            gamma_draw = jax.random.gamma(kp, alpha) / (beta + EPS)
            wd = jnp.where(do_prior, gamma_draw, wd)

            d_p = grad + wd * p

            # burn-in preconditioner adaptation
            tau_n = tau + (-tau * g * g / (v_hat + EPS) + 1.0)
            tau_inv = 1.0 / (tau_n + EPS)
            g_n = g + (-tau_inv * g + tau_inv * d_p)
            v_hat_n = v_hat + (-tau_inv * v_hat + tau_inv * d_p * d_p)
            tau = jnp.where(burn_in, tau_n, tau)
            g = jnp.where(burn_in, g_n, g)
            v_hat = jnp.where(burn_in, v_hat_n, v_hat)

            v_inv_sqrt = 1.0 / (jnp.sqrt(v_hat) + EPS)

            mom_draw = (jax.random.normal(km, p.shape, jnp.float32)
                        * jnp.sqrt(lr * lr * v_inv_sqrt))
            mom = jnp.where(do_mom, mom_draw, mom)

            noise_var = 2.0 * lr * lr * v_inv_sqrt * base_c - lr ** 4
            noise_std = jnp.sqrt(jnp.maximum(noise_var, 1e-16))
            noise = jax.random.normal(kn, p.shape, jnp.float32) * noise_std

            mom = mom + (-(lr * lr) * v_inv_sqrt * d_p - base_c * mom
                         + noise)
            mom = jnp.where(jnp.isfinite(mom), mom, 0.0)  # NaN/inf scrub
            return mom, tau, g, v_hat, wd

        out = jax.tree.map(
            leaf, params, grads, state.tau, state.g, state.v_hat,
            state.momentum, state.weight_decay, mom_keys, noise_keys,
            prior_keys)
        # unzip the 5-tuples
        mom = jax.tree.map(lambda t: t[0], out,
                           is_leaf=lambda t: isinstance(t, tuple))
        tau = jax.tree.map(lambda t: t[1], out,
                           is_leaf=lambda t: isinstance(t, tuple))
        g = jax.tree.map(lambda t: t[2], out,
                         is_leaf=lambda t: isinstance(t, tuple))
        v_hat = jax.tree.map(lambda t: t[3], out,
                             is_leaf=lambda t: isinstance(t, tuple))
        wd = jax.tree.map(lambda t: t[4], out,
                          is_leaf=lambda t: isinstance(t, tuple))

        new_state = SGHMCState(count=count + 1, rng=rng, tau=tau, g=g,
                               v_hat=v_hat, momentum=mom, weight_decay=wd)
        # the parameter update IS the momentum (p += v)
        return mom, new_state

    return optax.GradientTransformation(init, update)
