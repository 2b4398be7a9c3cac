#==============================================================================
# example07.py
# Overplot the analytical solution of a known problem (reference
# examples/example07.py).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim("adsod.dat")
setupsim()
run()
plot("x", "vx")
plotanalytical("x", "vx", ic="shocktube")
print("L1 error:", L1errornorm("shocktube", "x", "vx", -1.0, 1.0))
