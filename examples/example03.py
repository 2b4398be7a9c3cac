#==============================================================================
# example03.py
# Create a "blank" simulation object, set all important parameters in the
# script, then run to completion (reference examples/example03.py).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim(ndim=1, sim="gradhsph")
for key, value in {
        "ic": "soundwave", "Nhydro": 128, "rhofluid1": 1.0,
        "press1": 1.0, "amp": 1e-4, "dimensionless": 1,
        "boxmin[0]": 0.0, "boxmax[0]": 1.0,
        "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
        "tend": 1.0, "dt_snap": 0.2, "gas_eos": "energy_eqn"}.items():
    sim.SetParam(key, value)
setupsim()
run()
