#==============================================================================
# example16.py
# Retrieve snapshot data into plain numpy arrays (reference
# examples/example16.py).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim("adsod.dat")
setupsim()
run()
snap(-1)
rho = get_data("rho")
x = get_data("x")
print("N =", len(x), " max rho =", rho.max())
