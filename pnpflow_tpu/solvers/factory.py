"""Solver dispatch by method name (reference main.py:197-212).

Shared by the CLI driver (main.py) and the serving API (serve.py).
"""

from __future__ import annotations


def build_solver(bundle, args):
    from pnpflow_tpu.solvers.pnp_flow import PnPFlow

    if args.method == "pnp_flow":
        return PnPFlow(bundle, args)
    if args.method == "ot_ode":
        from pnpflow_tpu.solvers.ot_ode import OTOde

        return OTOde(bundle, args)
    if args.method == "d_flow":
        from pnpflow_tpu.solvers.d_flow import DFlow

        return DFlow(bundle, args)
    if args.method == "flow_priors":
        from pnpflow_tpu.solvers.flow_priors import FlowPriors

        return FlowPriors(bundle, args)
    if args.method == "pnp_gs":
        from pnpflow_tpu.solvers.pnp_gs import ProxPnP

        return ProxPnP(bundle, args)
    if args.method == "pnp_diff":
        from pnpflow_tpu.solvers.pnp_diff import PnPDiff

        return PnPDiff(bundle, args)
    raise ValueError("The method you entered does not exist")
