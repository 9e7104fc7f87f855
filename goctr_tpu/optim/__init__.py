from goctr_tpu.optim.optimizers import (FULLBATCH_SOLVERS, SOLVERS,
                                        fullbatch_minimize, make_solver)
from goctr_tpu.optim.schedules import make_schedule
