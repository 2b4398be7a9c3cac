#==============================================================================
# example13.py
# Create a new user-defined FORMULA quantity and plot it (reference
# examples/example13.py).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim("adsod.dat")
setupsim()
run()
CreateUserQuantity("entropy", "pressure/rho^gamma", unitlabel="",
                   scaling_factor=1.0)
plot("x", "entropy")
