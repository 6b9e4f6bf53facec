"""Physical constants and unit conversions (SI based).

Values mirror the reference implementation's constants module
(reference: src/constants.f90:1-161) so that energy bookkeeping matches the
published code to within float precision.  All constants are plain Python
floats (double precision); device arrays are cast on use.
"""
import math

pi = math.pi
two_pi = 2.0 * pi
four_pi = 4.0 * pi
four_thirds_pi = 4.0 / 3.0 * pi
half_pi = 0.5 * pi

# SI constants (CODATA 2014, as used by the reference)
hp = 6.626070040e-34        # Planck [J s]
kb = 1.38064852e-23         # Boltzmann [J/K]
c_light = 299792458.0       # speed of light [m/s]
thermal_const = c_light * hp / kb   # for (h c)/(lambda k T)
sigma_sb = 5.670367e-8      # Stefan-Boltzmann [W m^-2 K^-4]
Ggrav = 6.67428e-11         # [m^3 s^-2 kg^-1]

# Angles
deg_to_rad = pi / 180.0
rad_to_deg = 1.0 / deg_to_rad

# Lengths
AU_to_m = 149597870700.0    # IAU 2012
m_to_AU = 1.0 / AU_to_m
AU_to_cm = AU_to_m * 100.0
cm_to_AU = 1.0 / AU_to_cm
AU3_to_m3 = AU_to_m ** 3
AU3_to_cm3 = AU_to_cm ** 3
mum_to_m = 1.0e-6
mum_to_cm = 1.0e-4
cm_to_mum = 1.0e4
m_to_cm = 1.0e2

Rsun = 6.957e8              # [m] IAU 2015 B3
Rsun_to_AU = Rsun / AU_to_m
pc_to_AU = 648000.0 / pi    # IAU 2015 B2
AU_to_pc = 1.0 / pc_to_AU

# Energies / masses
Lsun = 3.828e26             # [W] IAU 2015
GxMsun = 1.3271244e20       # IAU 2015
Msun_to_kg = GxMsun / Ggrav
kg_to_Msun = 1.0 / Msun_to_kg
g_to_kg = 1.0e-3
kg_to_g = 1.0e3
Msun_to_g = Msun_to_kg * kg_to_g
g_to_Msun = 1.0 / Msun_to_g
jansky = 1.0e-26            # W m^-2 Hz^-1

# Time
year_to_s = 31557600.0      # 365.25 days

# Misc
T_Cmb = 2.7260              # [K]
mu_h = 2.3e-27              # mean molecular mass ~1.4 m_H [kg]
                            # (reference masseH * mu, constants.f90)

# Opacity normalisation: grain cross sections are in micron^2, number
# densities in cm^-3, flight lengths in AU; kappa [AU^-1] = C[mum^2] * n[cm^-3]
# * AU_to_cm * mum_to_cm^2  (reference: src/dust_prop.f90:958-966)
opacity_norm_fact = AU_to_cm * mum_to_cm ** 2  # = 149595.0...

tiny = 1.0e-30
huge = 1.0e30
