#==============================================================================
# example04.py
# Run a 2D KHI simulation and plot particle positions as it progresses
# (reference examples/example04.py).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim("khi.dat")
sim.SetParam("tend", 0.5)
setupsim()
plot("x", "y")
run()
