"""Multi-chip scaling: device meshes, sharded steps, sweep fan-out.

The reference is single-GPU with embarrassingly-parallel loops run
sequentially (MC samples, ensemble members, 3 seeds x precision sweeps —
reference: run_all_float.sh / run_all_quant.sh, SURVEY §2). Here those axes
map onto a jax.sharding Mesh: batch data-parallel over ICI for training,
MC-sample/ensemble-member parallel for evaluation, and whole-experiment
fan-out (seeds) via vmap for the small-model tier.
"""

from qbn_tpu.parallel.mesh import make_mesh, data_sharding, replicated
from qbn_tpu.parallel.sharded import (
    make_sharded_train_step, make_sharded_mc_eval,
)
