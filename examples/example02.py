#==============================================================================
# example02.py
# Prepare a simulation from a parameters file, modify a parameter, then run
# (reference examples/example02.py).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim("adsod.dat")
sim.SetParam("tend", 0.2)
sim.SetParam("Nlattice1[0]", 128)
setupsim()
run()
