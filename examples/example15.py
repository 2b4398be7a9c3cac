#==============================================================================
# example15.py
# Generate a movie from the snapshots of a simulation (reference
# examples/example15.py).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim("khi.dat")
sim.SetParam("tend", 0.8)
setupsim()
run()
make_movie("khi.mp4", x="x", y="y", render_quantity="rho")
