from det3d_tpu.solver.schedules import (annealing_cos, exponential_decay,
                                        manual_stepping, one_cycle)
from det3d_tpu.solver.optim import build_optimizer

__all__ = ["annealing_cos", "one_cycle", "exponential_decay",
           "manual_stepping", "build_optimizer"]
