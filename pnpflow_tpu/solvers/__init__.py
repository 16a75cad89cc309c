from pnpflow_tpu.solvers.base import ModelBundle, Solver
from pnpflow_tpu.solvers.pnp_flow import PnPFlow
