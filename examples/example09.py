#==============================================================================
# example09.py
# Create pure N-body initial conditions inside the script and run
# (reference examples/example09.py).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim(ndim=3, sim="nbody")
for key, value in {
        "ic": "plummer", "Nstar": 64, "dimensionless": 1,
        "nbody": "hermite4", "tend": 1.0, "dt_snap": 0.25,
        "gasfrac": 0.0, "starfrac": 1.0}.items():
    sim.SetParam(key, value)
setupsim()
run()
plot("x", "y")
