"""Evaluation: vmapped Monte-Carlo engine, SGHMC ensembles, uncertainty
harness (OOD + distortion sweeps), plots and the results store."""

from qbn_tpu.evaluation.mc import make_mc_eval, evaluate_with_loader
from qbn_tpu.evaluation.ensemble import (
    load_ensemble, stack_variables,
)
from qbn_tpu.evaluation.results import init_results, save_results, \
    load_results
