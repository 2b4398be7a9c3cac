#==============================================================================
# example08.py
# Create SPH initial conditions inside the python script via ImportArray
# (reference examples/example08.py: two colliding gas flows).
#==============================================================================
import numpy as np

from gandalf_tpu.analysis.facade import *

Nhydro = 200
vfluid = 4.0
xmin, xmax = -1.5, 1.5

deltax = (xmax - xmin) / Nhydro
x = np.linspace(xmin + 0.5 * deltax, xmax - 0.5 * deltax, num=Nhydro)
m = np.ones(Nhydro) * (xmax - xmin) / Nhydro
v = np.where(x < 0.0, vfluid, -vfluid)

sim = newsim(ndim=1, sim="gradhsph")
for key, value in {
        "ic": "python", "Nhydro": Nhydro, "dimensionless": 1,
        "boxmin[0]": xmin, "boxmax[0]": xmax,
        "boundary_lhs[0]": "periodic", "boundary_rhs[0]": "periodic",
        "tend": 0.05, "dt_snap": 0.01, "gas_eos": "isothermal",
        "temp0": 1.0, "mu_bar": 1.0}.items():
    sim.SetParam(key, value)
sim.ImportArray(x, "x")
sim.ImportArray(m, "m")
sim.ImportArray(v, "vx")
setupsim()
run()
plot("x", "rho")
