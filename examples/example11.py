#==============================================================================
# example11.py / example12.py
# Plot particle quantities with rescaled units (reference examples 11-12
# plot in alternative coordinate systems / units).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim("adsod.dat")
setupsim()
run()
window()
plot("x", "rho")
limit("x", -1.0, 1.0)
