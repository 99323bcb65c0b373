"""AOT serving export: freeze a trained predictor into a portable
StableHLO artifact.

The reference has no deployment story beyond "load the checkpoint into
the same Python stack" (reference: src/utils.py:112-123 load_model and
the eval phases of the 24 runner scripts). On TPU the idiomatic serving
unit is an ahead-of-time-lowered XLA program: `jax.export` serializes
the jitted MC predictor — weights baked in as constants, the MC-sample
axis, posterior sampling, quantised arithmetic and metric-free
aggregation all inside ONE program — to a self-contained artifact that
a serving host can deserialize and `call()` without this framework (or
any Python model code) installed. Cross-platform lowering means a CPU
build host can emit TPU artifacts (including the Pallas fused-draw
kernel, which lowers to a `tpu_custom_call`).

Artifact layout (a directory):
  predictor.stablehlo — jax.export serialization (bytes)
  manifest.json       — shapes/dtypes, sample count, mode, platforms,
                        model/task names, serialized-weight size
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from qbn_tpu.config import Config
from qbn_tpu.evaluation.mc import aggregate, mc_predict, presample_plan
from qbn_tpu.training.checkpoint import model_size_mb

_BLOB = "predictor.stablehlo"
_MANIFEST = "manifest.json"


def make_predictor(model, variables, cfg: Config, *, mode: str,
                   samples: Optional[int] = None, ensemble: bool = False,
                   use_plan: bool = False, chunk: Optional[int] = None,
                   freeze_draws: Optional[int] = None):
    """Build `fn(x, seed) -> prediction` with `variables` closed over.

    The returned function is pure and jittable: classification returns
    the MC-mean softmax probabilities, regression the (mean, total_var)
    decomposition (Var over sample means + mean aleatoric variance,
    reference: experiments/utils.py:348-355).

    Args:
      mode: 'float' | 'qat' | 'int' — the layer forward family.
      ensemble: variables carry a leading stacked-member axis (SGHMC).
      use_plan: INT only — bulk-draw all samples' int8 weight codes with
        the fused Pallas kernel and run the merged-channel forward (the
        production TPU formulation; requires a TPU lowering target).
      chunk: with use_plan, consume the presampled codes in chunks of
        this size via lax.scan (bounds weight materialisation exactly
        like bench.py); must divide `samples`.
      freeze_draws: with use_plan, draw the `samples` posterior weight
        samples ONCE at build time with this PRNG seed and bake the int8
        codes into the program as constants — the per-call Pallas draw
        (5.6 ms per 100 flagship samples, the dominant batch-1 cost)
        disappears and every call scores the same fixed sample bank
        (a fixed-ensemble approximation of the posterior, the same
        semantics as serving an SGHMC snapshot ensemble). Activation-side
        randomness (e.g. MC-Dropout masks) still follows `seed`.
    """
    n = cfg.samples if samples is None else samples
    plan = presample_plan(variables) if (use_plan and mode == "int") \
        else None
    if chunk is not None and plan is not None and n % chunk:
        raise ValueError(f"chunk {chunk} must divide samples {n}")
    frozen = None
    if freeze_draws is not None:
        if plan is None:
            raise ValueError("freeze_draws requires use_plan + INT mode "
                             "on a model with stochastic quantised layers")
        from qbn_tpu.evaluation.mc import draw_sampled_weights
        # eager draw on the build host (TPU kernel there, XLA oracle on a
        # CPU build host) — concrete arrays close over fn as constants
        frozen = jax.tree.map(
            np.asarray,
            draw_sampled_weights(variables, plan,
                                 jax.random.PRNGKey(freeze_draws), n))

    def fn(x, seed):
        key = jax.random.PRNGKey(seed)
        if plan is not None and chunk is not None and chunk < n:
            if frozen is None:
                from qbn_tpu.evaluation.mc import draw_sampled_weights
                k_w, key = jax.random.split(key)
                sampled = draw_sampled_weights(variables, plan, k_w, n)
            else:
                sampled = frozen
            sampled = jax.tree.map(
                lambda l: l.reshape((n // chunk, chunk) + l.shape[1:]),
                sampled)
            keys = jax.random.split(key, n // chunk)

            def body(_, sk):
                s_tree, k = sk
                outs = mc_predict(model, variables, x, k, samples=chunk,
                                  mode=mode, plan=plan, presampled=s_tree)
                return None, outs

            _, outs = jax.lax.scan(body, None, (sampled, keys))
            outs = jax.tree.map(
                lambda o: o.reshape((n,) + o.shape[2:]), outs)
        elif frozen is not None:
            outs = mc_predict(model, variables, x, key, samples=n,
                              mode=mode, plan=plan, presampled=frozen)
        else:
            outs = mc_predict(model, variables, x, key, samples=n,
                              mode=mode, ensemble=ensemble, plan=plan)
        return aggregate(cfg.task, outs, n)

    return fn


def _scope(batch: int, input_shape: Sequence[int]):
    return (jax.ShapeDtypeStruct((batch,) + tuple(input_shape),
                                 jnp.float32),
            jax.ShapeDtypeStruct((), jnp.int32))


def export_predictor(model, variables, cfg: Config, *, mode: str,
                     batch: int, input_shape: Sequence[int], path: str,
                     samples: Optional[int] = None,
                     ensemble: bool = False, use_plan: bool = False,
                     chunk: Optional[int] = None,
                     freeze_draws: Optional[int] = None,
                     platforms: Optional[Sequence[str]] = None) -> str:
    """Lower + serialize the predictor for `platforms` and write the
    artifact directory. Returns the blob path.

    platforms=None lowers for the current default backend; pass e.g.
    ('tpu',) to emit a TPU artifact from any build host.
    """
    fn = make_predictor(model, variables, cfg, mode=mode, samples=samples,
                        ensemble=ensemble, use_plan=use_plan, chunk=chunk,
                        freeze_draws=freeze_draws)
    # The Pallas fused-draw kernel lowers to the Mosaic custom call,
    # which is not on jax.export's forward-compatibility allowlist —
    # acknowledge it explicitly (artifact then binds to the emitting
    # toolchain's Mosaic version, fine for same-fleet serving).
    checks = []
    if use_plan:
        checks.append(
            jax.export.DisabledSafetyCheck.custom_call("tpu_custom_call"))
    exported = jax.export.export(
        jax.jit(fn),
        platforms=list(platforms) if platforms is not None else None,
        disabled_checks=checks,
    )(*_scope(batch, input_shape))

    os.makedirs(path, exist_ok=True)
    blob_path = os.path.join(path, _BLOB)
    with open(blob_path, "wb") as fh:
        fh.write(bytes(exported.serialize()))
    manifest = {
        "model": cfg.model,
        "task": cfg.task,
        "mode": mode,
        "samples": int(cfg.samples if samples is None else samples),
        "ensemble": bool(ensemble),
        "use_plan": bool(use_plan),
        "chunk": chunk,
        "freeze_draws": freeze_draws,
        "batch": int(batch),
        "input_shape": list(input_shape),
        "platforms": list(exported.platforms),
        "jax_version": jax.__version__,
        "weights_mb": round(model_size_mb(variables), 3),
        "output": "probs" if cfg.task == "classification"
                  else "(mean, total_var)",
    }
    with open(os.path.join(path, _MANIFEST), "w") as fh:
        json.dump(manifest, fh, indent=2)
    return blob_path


@dataclass
class LoadedPredictor:
    """A deserialized serving artifact: `call(x, seed)` executes the
    frozen program on the current backend."""
    manifest: Dict[str, Any]
    exported: Any

    def call(self, x, seed) -> Any:
        return self.exported.call(jnp.asarray(x, jnp.float32),
                                  jnp.asarray(seed, jnp.int32))


def load_predictor(path: str) -> LoadedPredictor:
    with open(os.path.join(path, _MANIFEST)) as fh:
        manifest = json.load(fh)
    with open(os.path.join(path, _BLOB), "rb") as fh:
        exported = jax.export.deserialize(fh.read())
    return LoadedPredictor(manifest=manifest, exported=exported)
