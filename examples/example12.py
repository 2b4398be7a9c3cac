#==============================================================================
# example12.py
# Plot particle quantities in an alternative coordinate system / units
# (reference examples/example12.py: Boss-Bodenheimer collapse, x-y particle
# plot with star overplot, rendered density, then re-plotted in au).
#==============================================================================
from gandalf_tpu.analysis.facade import *

sim = newsim("bossbodenheimer.dat")
sim.SetParam("tend", 0.02)
setupsim()
run()

# x-y positions of SPH particles in default units (pc), stars overplotted
plot("x", "y")
addplot("x", "y", type="star")
limit("x", -0.007, 0.007)
limit("y", -0.007, 0.007)

window()
render("x", "y", "rho", res=256)
limit("x", -0.007, 0.007)
limit("y", -0.007, 0.007)

# Re-plot the last snapshot in astronomical units (au)
window(1)
rescale("x", "au")
rescale("y", "au")
plot("x", "y")
window(2)
render("x", "y", "rho", res=256)
print("example12 OK: t =", sim.t)
