from polympc_tpu.nlp.types import (
    NLP, NLPBounds, SQPSettings, SQPSolution, unbounded,
)
from polympc_tpu.nlp.sqp import sqp_solve
from polympc_tpu.nlp.ip import IPNLPSettings, IPNLPSolution, nlp_ip_solve
from polympc_tpu.nlp.hessian import bfgs_update, sr1_update, regularize
from polympc_tpu.nlp.psarc import PsarcSettings, PsarcResult, psarc_solve
from polympc_tpu.nlp.tr import (
    trust_region_solve, projected_gradient_solve, TRSolution,
)

__all__ = [
    "NLP", "NLPBounds", "SQPSettings", "SQPSolution", "unbounded",
    "sqp_solve", "bfgs_update", "sr1_update", "regularize",
    "IPNLPSettings", "IPNLPSolution", "nlp_ip_solve",
    "PsarcSettings", "PsarcResult", "psarc_solve",
    "trust_region_solve", "projected_gradient_solve", "TRSolution",
]
