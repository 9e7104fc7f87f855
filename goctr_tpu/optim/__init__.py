from goctr_tpu.optim.optimizers import SOLVERS, make_solver
from goctr_tpu.optim.schedules import make_schedule
