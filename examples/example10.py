#==============================================================================
# example10.py
# Create a rendered column-density image of a snapshot (reference
# examples/example10.py).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim("khi.dat")
sim.SetParam("tend", 0.6)
setupsim()
run()
render("x", "y", "rho", res=128)
