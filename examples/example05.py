#==============================================================================
# example05.py
# Load a previously-run simulation from disk and inspect its snapshots
# (reference examples/example05.py).  Run example01 first with
# GANDALF_WRITE_SNAPSHOTS=1 so ADSOD.* snapshot files exist.
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = loadsim("ADSOD")
snap(-1)
print("loaded", len(sim.snapshots), "snapshots; final t =", sim.t)
