#==============================================================================
# example17.py
# Create a user-defined quantity from a python FUNCTION (reference
# examples/example17.py extends example13).
#==============================================================================
import numpy as np

from gandalf_tpu.analysis.facade import *

sim = newsim("adsod.dat")
setupsim()
run()
CreateUserQuantity("mach", "vx/sound")
plot("x", "mach")
