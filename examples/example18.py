#==============================================================================
# example18.py
# Plot quantities as a function of time through all snapshots, extending
# example14.py with FUNCTION-defined global time quantities (reference
# examples/example18.py: lagrangian half-mass radius + total mass vs time).
#==============================================================================
from gandalf_tpu.analysis.facade import *
from gandalf_tpu.analysis.compute import lagrangian_radii

sim = newsim("bossbodenheimer.dat")
sim.SetParam("tend", 0.02)
setupsim()
run()

# Define the half-mass radius as a time quantity and plot it
CreateTimeData("half_r", lagrangian_radii, mfrac=0.5)
time_plot("t", "half_r")


# Define a function for computing the total mass
def ComputeMass(snap, type="default", unit="default"):
    m = snap.extract_array("m")
    return m.sum()


# Define the quantity and plot it
CreateTimeData("totm", ComputeMass)
t, totm = TimeData("totm")
time_plot("t", "totm")
print("example18 OK:", len(t), "snapshots, total mass", totm[-1])
