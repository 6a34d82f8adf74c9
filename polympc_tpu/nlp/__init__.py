from polympc_tpu.nlp.types import (
    NLP, NLPBounds, SQPSettings, SQPSolution, unbounded,
)
from polympc_tpu.nlp.sqp import sqp_solve
from polympc_tpu.nlp.hessian import bfgs_update, sr1_update, regularize
from polympc_tpu.nlp.psarc import PsarcSettings, PsarcResult, psarc_solve

__all__ = [
    "NLP", "NLPBounds", "SQPSettings", "SQPSolution", "unbounded",
    "sqp_solve", "bfgs_update", "sr1_update", "regularize",
    "PsarcSettings", "PsarcResult", "psarc_solve",
]
