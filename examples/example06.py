#==============================================================================
# example06.py
# Load an old simulation, run a new one, and overplot both for comparison
# (reference examples/example06.py).
#==============================================================================
from gandalf_tpu.analysis.facade import *

old = loadsim("ADSOD")
x_old = get_data("x", snap_no=-1)
rho_old = get_data("rho", snap_no=-1)

sim = newsim("adsod.dat")
sim.SetParam("run_id", "ADSOD2")
sim.SetParam("Nlattice1[0]", 128)
setupsim()
run()
plot("x", "rho")
addplot(x_old, rho_old, marker="+")
