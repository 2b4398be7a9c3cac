#==============================================================================
# example14.py / example18.py
# Plot single-particle and global quantities as functions of time through
# all snapshots (reference examples 14 and 18).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim("adsod.dat")
setupsim()
run()
t, x0 = CreateTimeData("x", id=0)
print("particle 0 trajectory over", len(t), "snapshots")
