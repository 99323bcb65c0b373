#!/usr/bin/env python
"""TPU training-step throughput: BBB ResNet-18 CIFAR, float and QAT.

The headline bench covers INT MC *evaluation*; this measures the
production jitted TRAIN step (local-reparam forward, full backward,
optimiser, BN/observer updates) at the reference's CIFAR batch size —
the reference's other wall-clock axis (train_time,
reference: src/trainer.py:127-132). RTT-corrected chained-loop timing.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from qbn_tpu.config import Config
from qbn_tpu.models.factory import build_model
from qbn_tpu.training.trainer import TrainState, make_train_step
from qbn_tpu.training.metrics import cls_metrics_init
from qbn_tpu.training.optim import build_optimizer
from qbn_tpu.utils import init_variables

B = 256
ITERS = 16


def bench(phase: str):
    q = phase == "qat"
    cfg = Config(model="conv_resnet_bbb", dataset="cifar",
                 task="classification", input_size=(32, 32, 3),
                 output_size=10, batch_size=B, sigma_prior=0.05,
                 gamma=0.01, at=q, q=q,
                 learning_rate=1e-3 if not q else 1e-5,
                 optimizer="adam" if not q else "sgd")
    model = build_model(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, 32, 32, 3))
    y = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, 10)
    variables = init_variables(model, jax.random.PRNGKey(2), x,
                               quantized=q)
    tx, _ = build_optimizer(cfg, steps_per_epoch=100)
    params = variables["params"]
    model_state = {k: v for k, v in variables.items() if k != "params"}
    state = TrainState(params=params, opt_state=tx.init(params),
                      model_state=model_state, step=jnp.zeros((), jnp.int32),
                      rng=jax.random.PRNGKey(3))
    step = make_train_step(model, cfg, tx, "qat" if q else "float",
                           n_batches=100, n_points=45000,
                           jit_compile=False)

    @jax.jit
    def loop(state, metrics, x, y):
        def body(i, carry):
            st, ms = carry
            st, ms = step(st, ms, x * (1.0 + 1e-6 * i), y)[:2]
            return st, ms
        return lax.fori_loop(0, ITERS, body, (state, metrics))

    metrics = cls_metrics_init()
    # force a real device->host fetch each rep: block_until_ready can
    # return early through the relay (CLAUDE.md timing hazard)
    np.asarray(loop(state, metrics, x, y)[0].step)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(loop(state, metrics, x, y)[0].step)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_noise(rtt: float):
    """Cost of the local-reparam noise draws alone, per PRNG impl.

    The BBB train forward draws a standard normal PER OUTPUT ACTIVATION
    of every stochastic layer (~59M draws/step at the flagship shapes).
    threefry is ~20 ops per u32 on the VPU; TPU's rbg lowering is a
    hardware generator — this phase tells whether a Config-level PRNG
    switch is worth wiring for training."""
    shapes = ([(B, 32, 32, 24)] * 5 + [(B, 16, 16, 48)] * 5
              + [(B, 8, 8, 96)] * 5 + [(B, 4, 4, 192)] * 5 + [(B, 10)])
    total = sum(int(np.prod(s)) for s in shapes)
    for impl in ("threefry2x32", "rbg"):
        key = jax.random.key(0, impl=impl)

        @jax.jit
        def loop(key):
            def body(i, acc):
                k = jax.random.fold_in(key, i)
                ks = jax.random.split(k, len(shapes))
                s = acc
                for kk, sh in zip(ks, shapes):
                    s = s + jax.random.normal(kk, sh)[(0,) * len(sh)]
                return s
            return lax.fori_loop(0, ITERS, body, jnp.zeros(()))

        np.asarray(loop(key))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(loop(key))
            ts.append(time.perf_counter() - t0)
        per = (min(ts) - rtt) / ITERS
        print(f"noise[{impl:12s}] {per*1e3:7.2f} ms/step "
              f"({total/1e6:.0f} M draws)", flush=True)


def main():
    print("devices:", jax.devices(), flush=True)

    @jax.jit
    def ping(v):
        return lax.fori_loop(0, 8, lambda i, a: a + (v * 1.0001)[:2].sum(),
                             jnp.zeros(()))
    np.asarray(ping(jnp.ones((128,))))
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        np.asarray(ping(jnp.ones((128,))))
        ts.append(time.perf_counter() - t0)
    rtt = min(ts)
    print(f"RTT {rtt*1e3:.1f} ms", flush=True)
    for phase in ("float", "qat"):
        dt = bench(phase) - rtt
        per = dt / ITERS
        print(f"{phase:6s} train step {per*1e3:7.2f} ms  "
              f"{B/per:,.0f} examples/s", flush=True)
    bench_noise(rtt)


if __name__ == "__main__":
    main()
