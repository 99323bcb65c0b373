"""Monte-Carlo predictive evaluation: the sample axis lives on-chip.

The reference evaluates S posterior samples with a sequential Python loop
per batch (reference: experiments/utils.py:344-355). Here the S samples are
a vmapped leading axis over split PRNG keys — one XLA program computes all
samples, so the MXU sees batch*S-sized matmuls. For SGHMC ensembles the
same vmap runs over stacked member parameters (in_axes=0) instead of keys
(replacing the round-robin counter, reference: models_sgld.py:277-288).

Predictive aggregation matches the reference exactly:
  * classification: mean of softmax probabilities over samples;
  * regression: mean = E[mu]; var = Var[mu] (epistemic, unbiased/ddof=1 as
    torch.var) + E[sigma^2] (aleatoric).
"""

from __future__ import annotations

import os
import time
import zlib
from functools import partial
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qbn_tpu.config import Config
from qbn_tpu.training import metrics as M
from qbn_tpu.utils import split_rngs


def _one_sample(model, mode, variables, x, key):
    out, _ = model.apply(variables, x, train=False, mode=mode,
                         update_stats=False, rngs=split_rngs(key),
                         mutable=["kl"])
    return out


def merged_enabled() -> bool:
    """Transpose-free merged-layout INT path (default ON; QBN_MERGED=off
    reverts to the vmapped formulation)."""
    import os
    return os.environ.get("QBN_MERGED", "on") != "off"


def _trace_time_flags() -> tuple:
    """Snapshot of the QBN_* env flags that are read at TRACE time inside
    the jitted eval step (draw formulation + merged layout + fast-math).
    Folded into the _STEP_CACHE key so toggling a flag after the first
    eval in a process takes effect instead of silently hitting the memo."""
    return tuple(os.environ.get(k, d) for k, d in (
        ("QBN_MERGED", "on"), ("QBN_DRAW_FLAT", "off"),
        ("QBN_DRAW_ONE", "off"), ("QBN_DRAW_FAST", "on"),
        ("QBN_DRAW_ICDF", "on"), ("QBN_DRAW_PAIR", "on")))


def mc_predict(model, variables, x, key, *, samples: int, mode: str,
               ensemble: bool = False, plan=None, merged=None,
               presampled=None):
    """All-samples predictive outputs.

    Args:
      variables: one variable tree, or (if ensemble) a tree whose leaves are
        stacked along a leading member axis of size `samples`.
      plan: optional presampling plan (presample_plan): INT mode draws every
        stochastic layer's per-sample weight codes up-front (one fused
        Pallas kernel per layer over ALL samples) instead of inside the
        vmapped forward.
      merged: INT + plan only — run ONE forward in the merged channel
        layout (B, H, W, S*C) instead of vmapping over samples: the
        stochastic blocks see the full stacked 'sampled' axis and use
        feature-grouped convs / batched dense (MergedQTensor), so the int8
        sample-axis transpose of the vmapped lowering never exists
        (~2x end-to-end, tools/microbench_fgc.py). None = auto.
    Returns stacked raw outputs with leading sample axis.
    """
    if ensemble:
        return jax.vmap(
            lambda v, k: _one_sample(model, mode, v, x, k),
            in_axes=(0, 0))(variables, jax.random.split(key, samples))
    if (plan or presampled is not None) and mode == "int":
        if presampled is not None:
            # weights already drawn by the caller (e.g. once for ALL
            # samples, then chunked — saves re-drawing per chunk)
            sampled = presampled
        else:
            k_w, key = jax.random.split(key)
            sampled = draw_sampled_weights(variables, plan, k_w, samples)
        if merged is None:
            merged = merged_enabled()
        if merged:
            out = _one_sample(model, mode,
                              {**variables, "sampled": sampled}, x, key)
            # model outputs merged (B, S, ...): sample axis out front
            return jax.tree.map(lambda o: jnp.moveaxis(o, 1, 0), out)
        keys = jax.random.split(key, samples)
        return jax.vmap(
            lambda s_tree, k: _one_sample(
                model, mode, {**variables, "sampled": s_tree}, x, k)
        )(sampled, keys)
    if samples == 1:
        out = _one_sample(model, mode, variables, x, key)
        return jax.tree.map(lambda o: o[None], out)
    keys = jax.random.split(key, samples)
    return jax.vmap(
        lambda k: _one_sample(model, mode, variables, x, k))(keys)


def presample_plan(variables):
    """Static plan of stochastic quantised blocks: [(path, w_lo, w_hi)].

    Must be computed on CONCRETE variables (outside jit) — the flags are
    read eagerly. Returns None if the model has no stochastic blocks.
    """
    qconst = variables.get("qconst")
    if qconst is None:
        return None
    plan = []

    def walk(node, path):
        if not isinstance(node, dict):
            return
        if "w_codes" in node and "is_stoch" in node:
            if int(np.asarray(node["is_stoch"])) == 1:
                plan.append((path, int(np.asarray(node["w_lo"])),
                             int(np.asarray(node["w_hi"]))))
            return
        for k, v in node.items():
            walk(v, path + (k,))

    walk(qconst, ())
    return plan or None


def draw_sampled_weights(variables, plan, key, samples: int):
    """Traceable bulk posterior draw following a presample_plan.

    Uses the fused Pallas kernel on TPU, its XLA oracle elsewhere. Returns
    the 'sampled' collection tree ('w' leaf replacing each 'q' entry key).
    """
    from qbn_tpu.ops.pallas.sample_weights import (
        draw_all_layers, draw_flat, flat_rows, sample_weights_int8,
        sample_weights_oracle,
    )
    on_tpu = jax.devices()[0].platform == "tpu"
    # draw formulations (TPU only; see sample_weights.py). Measured on the
    # real v5e (tools/microbench_draw.py, flagship N=100 bulk draw):
    #   QBN_DRAW_FLAT — per-layer kernels on a lane-packed (rows, 512)
    #                   layout. Round-2 measured flat faster (5.98 vs
    #                   6.72 ms); round-3 REVERSED it twice (natural 5.61
    #                   < flat 6.06 ms) and the end-to-end trained-
    #                   checkpoint A/B in ONE session agreed (natural
    #                   395.5/396.5k vs flat 394.2k ex-samples/s) —
    #                   DEFAULT OFF (natural). Both paths bitwise-tested;
    #                   docs/BENCH_TABLE.md carries the history.
    #   QBN_DRAW_ONE  — ONE kernel for every layer (shared row buffer,
    #                   per-row qparams): 7.20 ms — the single serialized
    #                   grid loses more overlap than the ~21 launches
    #                   cost; kept as a measured-negative library.
    fused_all = (on_tpu and samples % 2 == 0
                 and os.environ.get("QBN_DRAW_ONE", "off") != "off")
    flat = os.environ.get("QBN_DRAW_FLAT", "off") != "off"

    entries = []           # (path, shape, w2, s2, qp, w_lo, w_hi)
    for (path, w_lo, w_hi) in plan:
        node = variables["qconst"]
        for k in path:
            node = node[k]
        shape = node["w_codes"].shape
        m = int(np.prod(shape[:-1]))
        n = int(shape[-1])
        qp = {k2: node[k2] for k2 in (
            "w_scale", "w_zp", "std_scale", "std_zp", "mul_scale",
            "mul_zp", "add_scale", "add_zp")}
        entries.append((path, shape, node["w_codes"].reshape(m, n),
                        node["std_codes"].reshape(m, n), qp, w_lo, w_hi))

    def emit(out, path, codes, shape):
        codes = codes.reshape((samples,) + shape)
        # insert at the module path, replacing the terminal 'q' with 'w'
        cursor = out
        for k in path[:-1]:
            cursor = cursor.setdefault(k, {})
        cursor["w"] = codes

    out = {}
    if fused_all:
        seed = jax.random.randint(key, (), 0, 2 ** 31 - 1)
        all_codes = draw_all_layers(
            [(w2, s2, qp, w_lo, w_hi)
             for (_p, _sh, w2, s2, qp, w_lo, w_hi) in entries],
            seed, samples)
        for (path, shape, *_rest), codes in zip(entries, all_codes):
            emit(out, path, codes, shape)
        return out

    # Scoped-VMEM guard: the whole-layer flat kernel blocks (2, rows, 512)
    # per grid step; past ~1024 rows the Mosaic block working set blows the
    # 16 MB scoped-VMEM budget when the draw sits inside a loop body
    # (measured on the v5e: the mnist LeNet fc1, rows=2393 — "Scoped
    # allocation with size 27.97M ... exceeded scoped vmem limit"; the
    # flagship's biggest layer, rows=648, is fine). Big-row layers run the
    # row-blocked whole-model kernel on a one-layer pack instead: 512-row
    # blocks, same lane-packed layout, per-row qparams.
    big_rows = 1024
    for i, (path, shape, w2, s2, qp, w_lo, w_hi) in enumerate(entries):
        k_i = jax.random.fold_in(key, i)
        m, n = w2.shape
        big = flat_rows(m, n) > big_rows
        if on_tpu and not (big and samples % 2 != 0):
            seed = jax.random.randint(k_i, (), 0, 2 ** 31 - 1)
            if flat and big:
                codes = draw_all_layers([(w2, s2, qp, w_lo, w_hi)],
                                        seed, samples)[0]
            elif flat:
                codes = draw_flat(w2, s2, qp, seed, samples, w_lo, w_hi)
            elif big:
                # natural whole-layer blocks have the same hazard
                codes = draw_all_layers([(w2, s2, qp, w_lo, w_hi)],
                                        seed, samples)[0]
            else:
                codes = sample_weights_int8(w2, s2, qp, seed, samples,
                                            w_lo, w_hi)
        else:
            noise = jax.random.normal(k_i, (samples, m, n), jnp.float32)
            codes = sample_weights_oracle(w2, s2, qp, noise, w_lo, w_hi)
        emit(out, path, codes, shape)
    return out


def aggregate(task: str, outs, samples: int):
    """Reference predictive aggregation over the sample axis."""
    if task == "classification":
        return jnp.mean(outs, axis=0)
    mu, var = outs
    mean = jnp.mean(mu, axis=0)
    if samples > 1:
        total_var = jnp.var(mu, axis=0, ddof=1) + jnp.mean(var, axis=0)
    else:
        total_var = jnp.mean(var, axis=0)
    return mean, total_var


# Eval-step memo: the uncertainty sweep calls evaluate_with_loader once
# per cell (3 splits + OOD + 15 distortion cells); a fresh @jax.jit per
# cell would retrace AND remote-recompile the identical program every
# time (~45 s/cell through the relay — measured as the dominant eval
# cost, dwarfing the actual MC compute). Keyed by step semantics; values
# keep the model/mesh referents alive so id() keys stay valid.
_STEP_CACHE: dict = {}
_SCAN_CACHE: dict = {}
_SWEEP_CACHE: dict = {}


def make_mc_eval(model, cfg: Config, mode: str, samples: Optional[int] = None,
                 ensemble: bool = False, plan=None, mesh=None):
    """Jitted batch evaluator: (variables, metric_state, x, y, key) ->
    (metric_state, aggregated_output). `plan` (from presample_plan) enables
    the fused bulk weight draw on the INT path. With a mesh (and
    samples % n_devices == 0) the sample axis is sharded over the devices,
    composing with the plan (qbn_tpu.parallel.sharded). Steps are memoised
    across calls (same model/mode/samples/plan -> same compiled program)."""
    samples = cfg.samples if samples is None else samples
    plan_key = None if plan is None else tuple(
        (tuple(p), int(lo), int(hi)) for p, lo, hi in plan)
    # flax modules hash/compare by hyperparameter value, so same-config
    # models from DIFFERENT runs (grid seeds, SGHMC snapshots) share the
    # compiled step — the model object itself is the semantic key
    cache_key = (model, id(mesh), cfg.task, mode, samples, ensemble,
                 plan_key, _trace_time_flags())
    hit = _STEP_CACHE.get(cache_key)
    if hit is not None:
        return hit[-1]
    if mesh is not None and samples % mesh.devices.size == 0 and samples > 1:
        from qbn_tpu.parallel.sharded import make_sharded_mc_eval
        step = make_sharded_mc_eval(model, cfg, mode, mesh,
                                    samples=samples, ensemble=ensemble,
                                    plan=plan)
        _STEP_CACHE[cache_key] = (model, mesh, step)
        return step
    task = cfg.task

    @jax.jit
    def step(variables, metric_state, x, y, key):
        outs = mc_predict(model, variables, x, key, samples=samples,
                          mode=mode, ensemble=ensemble, plan=plan)
        agg = aggregate(task, outs, samples)
        if task == "classification":
            metric_state = M.cls_metrics_update(metric_state, agg, y)
        else:
            mean, var = agg
            metric_state = M.reg_metrics_update(metric_state, mean, var, y)
        return metric_state, agg

    _STEP_CACHE[cache_key] = (model, mesh, step)
    return step


def _scan_eval(step, k: int):
    """jitted scan of `step` over k stacked batches: ONE dispatch and ONE
    device->host fetch per split instead of per batch (each per-batch
    fetch pays the ~100-200 ms relay RTT). Memoised on (step, k) so all
    same-length cells (test/OOD/15 distortion sets) share one compile."""
    hit = _SCAN_CACHE.get((id(step), k))
    if hit is not None:
        return hit[-1]

    @jax.jit
    def run(variables, metric_state, xs, ys, base_key, key_base_idx):
        def body(ms, inp):
            i, x, y = inp
            kk = jax.random.fold_in(base_key, key_base_idx + i)
            ms, agg = step(variables, ms, x, y, kk)
            return ms, agg
        return jax.lax.scan(body, metric_state,
                            (jnp.arange(k, dtype=jnp.int32), xs, ys))

    _SCAN_CACHE[(id(step), k)] = (step, run)
    return run


def _dist_split_enabled(cfg) -> bool:
    """Distortion-sweep dispatch mode: one-program-per-cell ("split") vs
    the monolithic 15-cell scan.

    QBN_DIST_SPLIT=on/off forces it. Unset = AUTO, decided from round-4/5
    evidence: the monolithic program killed the TPU worker twice
    ("UNAVAILABLE ... kernel fault") on the mcdropout-cifar float leg —
    per-(sample,channel) masked forwards under the 15-cell outer scan —
    while the identical program shape ran clean for pointwise/bbb/sgld
    and the SPLIT path completed that exact leg (round 5, campaign
    stage A). So: split ON for always-on-dropout models (cfg.p > 0) on
    TPU, monolithic elsewhere (saves 14 dispatch+fetch relay round
    trips, ~3 s/eval). See tools/repro_dist_fault.py for the bisect
    probe; docs/STATUS.md round-5 entry for the evidence trail."""
    mode = os.environ.get("QBN_DIST_SPLIT", "")
    if mode in ("on", "off"):
        return mode == "on"
    return jax.default_backend() == "tpu" and cfg.p > 0


def _sweep_scan(step, k: int, n_rem: int, norm_kind):
    """jitted program for the ENTIRE distortion sweep: an outer lax.scan
    over the stacked cell specs (gather indices, zero mask, brightness
    factor, per-cell PRNG key), an inner scan over the k on-device clean
    batches, the remainder batch distorted in-program too. The whole
    3x5 sweep is ONE dispatch and ONE metric fetch."""
    hit = _SWEEP_CACHE.get((id(step), k, n_rem, norm_kind))
    if hit is not None:
        return hit[-1]
    from qbn_tpu.data.datasets import CIFAR_INV_STD, CIFAR_MEAN

    def norm(z):
        if norm_kind == "cifar":
            return (z - jnp.asarray(CIFAR_MEAN)) * jnp.asarray(CIFAR_INV_STD)
        return z

    def distort(z, syi, sxi, valid, factor):
        # jnp mirror of data/distortions.apply_spec: gather, PIL-faithful
        # uint8 brighten when factor != 1 (trunc of float32(v)*factor),
        # zero mask. Bitwise equal to the host path on v/255 images.
        g = z[..., syi, sxi, :]
        bright = jnp.clip(jnp.trunc(jnp.rint(g * 255.0) * factor),
                          0.0, 255.0) / 255.0
        vb = valid[(None,) * (z.ndim - 3) + (Ellipsis, None)]
        return jnp.where(factor == 1.0, g, bright) * vb

    @jax.jit
    def run(variables, xs, ys, x_rem, y_rem, syis, sxis, valids, factors,
            base_keys, key_base_idx):
        def cell(carry, spec):
            syi, sxi, valid, factor, base_key = spec
            xd = norm(distort(xs, syi, sxi, valid, factor))

            def body(ms, inp):
                i, x, y = inp
                kk = jax.random.fold_in(base_key, key_base_idx + i)
                ms, _ = step(variables, ms, x, y, kk)
                return ms, None

            ms, _ = jax.lax.scan(body, M.cls_metrics_init(),
                                 (jnp.arange(k, dtype=jnp.int32), xd, ys))
            if n_rem:
                xr = distort(x_rem, syi, sxi, valid, factor)
                kk = jax.random.fold_in(base_key, key_base_idx + k)
                ms, _ = step(variables, ms, norm(xr), y_rem, kk)
            return carry, M.cls_metrics_compute(ms)

        _, per_cell = jax.lax.scan(
            cell, None, (syis, sxis, valids, factors, base_keys))
        return per_cell

    _SWEEP_CACHE[(id(step), k, n_rem, norm_kind)] = (step, run)
    return run


def evaluate_distortion_sweep(model, variables, cfg: Config, mode: str,
                              samples: Optional[int] = None,
                              ensemble: bool = False, seed: int = 0,
                              mesh=None):
    """Device-resident 3x5 distortion sweep.

    The loader path distorts the full test set on HOST and re-uploads it
    for every cell (15 x ~123 MB of relay H2D for CIFAR, plus per-cell
    numpy/native distortion work). This path uploads the CLEAN test set
    once and generates every distorted cell ON DEVICE via the gather
    formulation (data/distortions.gather_spec); the whole 3x5 sweep —
    including the remainder batch — runs as ONE jitted program: one
    dispatch and one metric fetch total, zero host image work. PRNG
    keys, batch partitioning and arithmetic are identical to
    evaluate_with_loader on a get_test_loader(cfg, distortion, level)
    loader (salt f"{distortion}{level}").

    Returns [(distortion, level, error, ece, entropy, nll), ...] or None
    when the fast path's preconditions fail (mesh run, debug mode,
    non-classification task, CPU backend, tiny split) — callers fall back
    to the per-cell loader path.
    """
    from qbn_tpu.utils import scan_enabled
    if (mesh is not None or cfg.debug or cfg.task != "classification"
            or cfg.dataset not in ("mnist", "cifar")
            or not scan_enabled("QBN_EVAL_SCAN")):
        return None
    from qbn_tpu.data import datasets as D
    from qbn_tpu.data.distortions import DISTORTIONS, LEVELS, gather_spec
    x, y = D.load_images(cfg.dataset, cfg.data, train=False)
    bsz = cfg.batch_size
    k = len(x) // bsz
    if k < 2:
        return None
    nb = (len(x) + bsz - 1) // bsz          # loader length (keeps remainder)
    norm_kind = "cifar" if cfg.dataset == "cifar" else None
    samples = cfg.samples if samples is None else samples
    plan = None
    if mode == "int" and not ensemble and samples > 1:
        plan = presample_plan(variables)
    if nb - k > 1:
        return None                 # at most one remainder batch expected
    step = make_mc_eval(model, cfg, mode, samples, ensemble, plan=plan)
    xs = jnp.asarray(x[:k * bsz].reshape((k, bsz) + x.shape[1:]))
    ys = jnp.asarray(y[:k * bsz].reshape((k, bsz) + y.shape[1:]))
    n_rem = len(x) - k * bsz
    x_rem = jnp.asarray(x[k * bsz:])
    y_rem = jnp.asarray(y[k * bsz:])
    cells = [(d, lv) for d in DISTORTIONS for lv in range(LEVELS)]
    specs = [gather_spec(d, lv, x.shape[1], x.shape[2]) for d, lv in cells]
    base_keys = jnp.stack([
        jax.random.fold_in(jax.random.PRNGKey(cfg.seed + 1234),
                           zlib.crc32(f"{d}{lv}".encode()) & 0x7FFFFFFF)
        for d, lv in cells])
    run = _sweep_scan(step, k, n_rem, norm_kind)
    seed_op = jnp.asarray(seed * 1000003, jnp.int32)
    if _dist_split_enabled(cfg):
        # One SMALL program per cell instead of one giant 15-cell scan:
        # identical math and keys (each cell's metrics depend only on its
        # own spec/key), but every dispatch is clean-test-eval-sized. The
        # monolithic program crashed the TPU worker ("UNAVAILABLE ...
        # kernel fault") twice on the mcdropout-cifar float leg (rounds
        # 4b and 4d) while the same-shape test/OOD scan evals succeeded;
        # the singleton-stack shape compiles once and is reused 15x, so
        # the cost is 14 extra dispatch+fetch round trips (~3 s).
        vals = []
        for c, (d, lv) in enumerate(cells):
            pc = jax.device_get(run(
                variables, xs, ys, x_rem, y_rem,
                *(jnp.asarray(np.stack([specs[c][i]])) for i in range(4)),
                base_keys[c:c + 1], seed_op))
            vals.append((d, lv, float(pc["error"][0]), float(pc["ece"][0]),
                         float(pc["entropy"][0]), float(pc["nll"][0])))
        return vals
    per_cell = jax.device_get(run(
        variables, xs, ys, x_rem, y_rem,
        *(jnp.asarray(np.stack([s[i] for s in specs])) for i in range(4)),
        base_keys, seed_op))
    return [(d, lv, float(per_cell["error"][c]), float(per_cell["ece"][c]),
             float(per_cell["entropy"][c]), float(per_cell["nll"][c]))
            for c, (d, lv) in enumerate(cells)]


def evaluate_with_loader(loader, model, variables, cfg: Config, mode: str,
                         samples: Optional[int] = None,
                         ensemble: bool = False, seed: int = 0,
                         collect_outputs: bool = True, salt: str = "",
                         mesh=None):
    """Full-loader MC evaluation.

    Returns (error, ece, entropy, nll, outputs, targets, samples_per_sec)
    mirroring the reference's _evaluate_with_loader contract
    (reference: experiments/utils.py:330-377) plus a throughput figure.

    `salt` names the split being evaluated (e.g. "test", "random",
    "rotation3") so posterior-sample noise is independent across splits;
    without it, batch i of every split would draw identical keys.
    """
    samples = cfg.samples if samples is None else samples
    plan = None
    if mode == "int" and not ensemble and samples > 1:
        plan = presample_plan(variables)
    step = make_mc_eval(model, cfg, mode, samples, ensemble, plan=plan,
                        mesh=mesh)
    metric_state = (M.cls_metrics_init() if cfg.task == "classification"
                    else M.reg_metrics_init())
    outputs, targets = [], []
    n_examples = 0
    base_key = jax.random.fold_in(
        jax.random.PRNGKey(cfg.seed + 1234),
        zlib.crc32(salt.encode()) & 0x7FFFFFFF)
    t0 = time.time()
    batches = []
    for x, y in loader:
        batches.append((np.asarray(x), np.asarray(y)))
        if cfg.debug:
            break
    # Scan fast path: stack the split's full-size batches on device and
    # lax.scan the eval step over them — one dispatch + one fetch per
    # split instead of per batch (per-batch host syncs pay the relay RTT
    # each; identical keys/arithmetic to the per-batch loop, tested
    # bitwise in tests/test_eval_scan.py). Mesh runs keep the loop (the
    # sharded step manages its own data placement).
    from qbn_tpu.utils import scan_enabled
    k = len(batches)
    if k > 1 and batches[-1][0].shape != batches[0][0].shape:
        k -= 1
    use_scan = (mesh is None and not cfg.debug and k >= 2
                and scan_enabled("QBN_EVAL_SCAN")
                and all(b[0].shape == batches[0][0].shape
                        for b in batches[:k]))
    start = 0
    if use_scan:
        xs = jnp.asarray(np.stack([b[0] for b in batches[:k]]))
        ysb = jnp.asarray(np.stack([b[1] for b in batches[:k]]))
        run = _scan_eval(step, k)
        metric_state, aggs = run(variables, metric_state, xs, ysb,
                                 base_key,
                                 jnp.asarray(seed * 1000003, jnp.int32))
        n_examples += sum(len(b[1]) for b in batches[:k])
        if collect_outputs:
            outputs.append(jax.tree.map(
                lambda a: np.asarray(a).reshape((-1,) + a.shape[2:]),
                aggs))
            targets.append(np.concatenate([b[1] for b in batches[:k]]))
        start = k
    for i in range(start, len(batches)):
        x, y = batches[i]
        key = jax.random.fold_in(base_key, seed * 1000003 + i)
        metric_state, agg = step(variables, metric_state, jnp.asarray(x),
                                 jnp.asarray(y), key)
        n_examples += len(y)
        if collect_outputs:
            outputs.append(jax.tree.map(np.asarray, agg))
            targets.append(np.asarray(y))
    jax.block_until_ready(metric_state)
    dt = max(time.time() - t0, 1e-9)
    sps = n_examples * samples / dt

    if cfg.task == "classification":
        m = {k: float(v) for k, v in jax.device_get(
            M.cls_metrics_compute(metric_state)).items()}
        error, ece, entropy = m["error"], m["ece"], m["entropy"]
    else:
        m = {k: float(v) for k, v in jax.device_get(
            M.reg_metrics_compute(metric_state)).items()}
        error, ece, entropy = m["rmse"], 0.0, 0.0
    nll = m["nll"]

    if collect_outputs and outputs:
        if cfg.task == "classification":
            out = np.concatenate(outputs)
        else:
            out = (np.concatenate([o[0] for o in outputs]),
                   np.concatenate([o[1] for o in outputs]))
        tgt = np.concatenate(targets)
    else:
        out, tgt = None, None
    return error, ece, entropy, nll, out, tgt, sps
