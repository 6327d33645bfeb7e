from psulvsb_tpu.solver.config import (
    SolverParams,
    RotationEstimationAlgorithm,
    InlierSelectionMode,
    InlierGraphFormulation,
)
from psulvsb_tpu.solver.solution import RegistrationSolution
from psulvsb_tpu.solver.classic import solve_decoupled
from psulvsb_tpu.solver.psulvsb import psulvsb_solve
