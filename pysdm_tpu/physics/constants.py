"""Physical-constant catalogue.

Values transcribed from the reference catalogue
(``/root/reference/PySDM/physics/constants.py`` and ``constants_defaults.py``)
— these are published physical constants / fit coefficients (CODATA, NIST,
IAEA-VSMOW, and the cited papers), kept identical so the two codebases agree
numerically. The engine exposes them as a frozen, hashable namespace of plain
Python floats: inside jit traces they become compile-time literals.
"""

import math
from collections import namedtuple

from .si import (
    si,
    PPM,
    PER_CENT,
    PER_MILLE,
    T0,
    M,
    PI,
    PI_4_3,
    LN_2,
    sqrt_two,
    sqrt_pi,
)

_g_std = 9.80665  # scipy.constants.g
_R_str = 8.31446261815324  # scipy.constants.R
_N_A = 6.02214076e23  # scipy.constants.N_A

DEFAULTS = dict(
    # dimensionless helpers (usable inside formula bodies)
    PI=PI,
    PI_4_3=PI_4_3,
    LN_2=LN_2,
    sqrt_two=sqrt_two,
    sqrt_pi=sqrt_pi,
    ONE_THIRD=1.0 / 3.0,
    ONE_HALF=0.5,
    TWO_THIRDS=2.0 / 3.0,
    ONE_AND_A_HALF=1.5,
    TWO_AND_A_HALF=2.5,
    ZERO=0.0,
    ZERO_MASS=0.0,
    ZERO_VOLUME=0.0,
    ONE=1.0,
    TWO=2.0,
    THREE=3.0,
    FOUR=4.0,
    TWELVE=12.0,
    PPT=1e-12,
    PPB=1e-9,
    PPM=PPM,
    PER_CENT=PER_CENT,
    PER_MILLE=PER_MILLE,
    PER_MEG=PPM,
    T0=T0,
    M=M,
    K_H2O=1e-14 * M * M,
    CM=si.cm,
    UM=si.um,
    dT_u=si.K,
    one_kelvin=1.0 * si.K,
    NaN=math.nan,
    # molar masses (NIST / Gatley et al. 2008)
    Md=28.966 * si.g / si.mole,
    M_1H=1.00782503224 * si.g / si.mole,
    M_2H=2.01410177812 * si.g / si.mole,
    M_3H=3.01604927792 * si.g / si.mole,
    M_16O=15.99491461957 * si.g / si.mole,
    M_17O=16.99913175651 * si.g / si.mole,
    M_18O=17.99915961287 * si.g / si.mole,
    # VSMOW isotope abundance ratios (IAEA)
    VSMOW_R_2H=155.76 * PPM,
    VSMOW_R_3H=1.85e-11 * PPM,
    VSMOW_R_18O=2005.20 * PPM,
    VSMOW_R_17O=379.9 * PPM,
    # universal constants
    R_str=_R_str,
    N_A=_N_A,
    g_std=_g_std,
    # accommodation / correction coefficients
    MAC=1.0,
    HAC=1.0,
    MAC_ice=0.5,
    HAC_ice=1.0,
    C_cunn=0.7,
    # August-Roche-Magnus saturation vapour pressure fit
    ARM_C1=6.1094 * si.hPa,
    ARM_C2=17.625,
    ARM_C3=243.04 * si.K,
    # Flatau, Walko & Cotton 1992 polynomial fit
    FWC_C0=6.115836990e000 * si.hPa,
    FWC_C1=0.444606896e000 * si.hPa,
    FWC_C2=0.143177157e-01 * si.hPa,
    FWC_C3=0.264224321e-03 * si.hPa,
    FWC_C4=0.299291081e-05 * si.hPa,
    FWC_C5=0.203154182e-07 * si.hPa,
    FWC_C6=0.702620698e-10 * si.hPa,
    FWC_C7=0.379534310e-13 * si.hPa,
    FWC_C8=-0.321582393e-15 * si.hPa,
    FWC_I0=6.098689930e000 * si.hPa,
    FWC_I1=0.499320233e000 * si.hPa,
    FWC_I2=0.184672631e-01 * si.hPa,
    FWC_I3=0.402737184e-03 * si.hPa,
    FWC_I4=0.565392987e-05 * si.hPa,
    FWC_I5=0.521693933e-07 * si.hPa,
    FWC_I6=0.307839583e-09 * si.hPa,
    FWC_I7=0.105785160e-11 * si.hPa,
    FWC_I8=0.161444444e-14 * si.hPa,
    # Lowe 1977 polynomial fit
    L77W_A0=6.107799961 * si.hPa,
    L77W_A1=4.436518521e-1 * si.hPa,
    L77W_A2=1.428945805e-2 * si.hPa,
    L77W_A3=2.650648471e-4 * si.hPa,
    L77W_A4=3.031240396e-6 * si.hPa,
    L77W_A5=2.034080948e-8 * si.hPa,
    L77W_A6=6.136820929e-11 * si.hPa,
    L77I_A0=6.109177956 * si.hPa,
    L77I_A1=5.03469897e-1 * si.hPa,
    L77I_A2=1.886013408e-2 * si.hPa,
    L77I_A3=4.176223716e-4 * si.hPa,
    L77I_A4=5.824720280e-6 * si.hPa,
    L77I_A5=4.838803174e-8 * si.hPa,
    L77I_A6=1.838826904e-10 * si.hPa,
    # Bolton 1980
    B80W_G0=6.112 * si.hPa,
    B80W_G1=17.67,
    B80W_G2=243.5 * si.K,
    # Wexler 1976
    W76W_G0=-2.9912729e3,
    W76W_G1=-6.0170128e3,
    W76W_G2=1.887643854e1,
    W76W_G3=-2.8354721e-2,
    W76W_G4=1.7838301e-5,
    W76W_G5=-8.4150417e-10,
    W76W_G6=4.4412543e-13,
    W76W_G7=2.858487,
    W76W_G8=1.0 * si.Pa,
    # Murphy & Koop 2005
    MK05_ICE_C1=1.0 * si.Pa,
    MK05_ICE_C2=9.550426,
    MK05_ICE_C3=5723.265 * si.K,
    MK05_ICE_C4=3.53068,
    MK05_ICE_C5=1.0 * si.K,
    MK05_ICE_C6=0.00728332,
    MK05_LIQ_C1=1.0 * si.Pa,
    MK05_LIQ_C2=54.842763,
    MK05_LIQ_C3=6763.22 * si.K,
    MK05_LIQ_C4=4.210,
    MK05_LIQ_C5=1.0 * si.K,
    MK05_LIQ_C6=0.000367,
    MK05_LIQ_C7=0.0415,
    MK05_LIQ_C8=218.8 * si.K,
    MK05_LIQ_C9=53.878,
    MK05_LIQ_C10=1331.22 * si.K,
    MK05_LIQ_C11=9.44523,
    MK05_LIQ_C12=1.0 * si.K,
    MK05_LIQ_C13=0.014025,
    MK05_SUB_C1=46782.5,
    MK05_SUB_C2=35.8925,
    MK05_SUB_C3=0.07414,
    MK05_SUB_C4=541.5,
    MK05_SUB_C5=123.75 * si.K,
    # densities
    rho_w=1.0 * si.kg / si.litre,
    rho_i=916.8,
    pH_w=7.0,
    # reference pressures / triple point (Murphy & Koop 2005)
    p1000=1000 * si.hPa,
    p_tri=611.657 * si.Pa,
    T_tri=273.16 * si.K,
    L_tri=45051.0,
    T_STP=T0 + 15.0,
    p_STP=101325.0,
    ROOM_TEMP=T0 + 25.0,
    # Lowe et al. 2019 fit coefficients
    l_l19_a=0.167,
    l_l19_b=3.65e-4,
    k_l19_a=4.2e-3,
    k_l19_b=1.0456,
    k_l19_c=0.017,
    # diffusion kinetics / thermics
    dv_pk05=0.0,
    lmbd_w_0=6.6e-8,
    d_l19_a=0.211e-4,
    d_l19_b=1.94,
    D0=2.26e-5,
    D_exp=1.81,
    K0=2.4e-2,
    diffusion_thermics_D_G11_A=1e-5,
    diffusion_thermics_D_G11_B=0.015,
    diffusion_thermics_D_G11_C=-1.9,
    diffusion_thermics_K_G11_A=1.5e-11,
    diffusion_thermics_K_G11_B=-4.8e-8,
    diffusion_thermics_K_G11_C=1e-4,
    diffusion_thermics_K_G11_D=-3.9e-4,
    # specific heats
    c_pd=1005.0,
    c_pv=1850.0,
    c_pw=4218.0,
    # surface tension
    sgm_w=0.072,
    sgm_org=math.nan,
    delta_min=math.nan,
    RUEHL_nu_org=math.nan,
    RUEHL_A0=math.nan,
    RUEHL_C0=math.nan,
    RUEHL_m_sigma=math.nan,
    RUEHL_sgm_min=math.nan,
    # freezing
    BIGG_DT_MEDIAN=math.nan,
    NIEMAND_A=math.nan,
    NIEMAND_B=math.nan,
    ABIFM_UNIT=1.0 / si.cm**2 / si.s,
    ABIFM_M=math.inf,
    ABIFM_C=math.inf,
    KOOP_2000_C1=-906.7,
    KOOP_2000_C2=8502.0,
    KOOP_2000_C3=-26924.0,
    KOOP_2000_C4=29180.0,
    KOOP_UNIT=1.0 / si.cm**3 / si.s,
    KOOP_MIN_DA_W_ICE=0.26,
    KOOP_MAX_DA_W_ICE=0.34,
    KOOP_CORR=-1.522,
    KOOP_MURRAY_C0=-3020.684,
    KOOP_MURRAY_C1=-425.921,
    KOOP_MURRAY_C2=-25.9779,
    KOOP_MURRAY_C3=-0.868451,
    KOOP_MURRAY_C4=-1.66203e-2,
    KOOP_MURRAY_C5=-1.71736e-4,
    KOOP_MURRAY_C6=-7.46953e-7,
    J_HET=math.nan,
    J_HOM=math.nan,
    # breakup
    STRAUB_E_D1=0.04 * si.cm,
    STRAUB_MU2=0.095 * si.cm,
    # Vedder 1987 erfinv approximation
    VEDDER_1987_b=89.0 / 880,
    VEDDER_1987_A=993.0 / 880 / 3 / (89.0 / 880),
    # isotope fractionation fits (Merlivat & Nief 1967, Majoube, Van Hook, ...)
    MERLIVAT_NIEF_1967_ALPHA_L_2H_T2=15013.0,
    MERLIVAT_NIEF_1967_ALPHA_L_2H_T1=0.0,
    MERLIVAT_NIEF_1967_ALPHA_L_2H_T0=-0.1,
    MERLIVAT_NIEF_1967_ALPHA_I_2H_T2=16289.0,
    MERLIVAT_NIEF_1967_ALPHA_I_2H_T1=0.0,
    MERLIVAT_NIEF_1967_ALPHA_I_2H_T0=-0.0945,
    LAMB_ET_AL_2017_ALPHA_I_2H_T2=13525.0,
    LAMB_ET_AL_2017_ALPHA_I_2H_T1=0.0,
    LAMB_ET_AL_2017_ALPHA_I_2H_T0=-0.0559,
    ELLEHOJ_ET_AL_2013_ALPHA_I_2H_T2=48888.0,
    ELLEHOJ_ET_AL_2013_ALPHA_I_2H_T1=-203.1,
    ELLEHOJ_ET_AL_2013_ALPHA_I_2H_T0=0.2133,
    MAJOUBE_1971_ALPHA_L_18O_T2=1137.0,
    MAJOUBE_1971_ALPHA_L_18O_T1=-0.4156,
    MAJOUBE_1971_ALPHA_L_18O_T0=-0.0020667,
    MAJOUBE_1971_ALPHA_L_2H_T2=24844.0,
    MAJOUBE_1971_ALPHA_L_2H_T1=-76.248,
    MAJOUBE_1971_ALPHA_L_2H_T0=0.052612,
    MAJOUBE_1970_ALPHA_I_18O_T2=0.0,
    MAJOUBE_1970_ALPHA_I_18O_T1=11.839,
    MAJOUBE_1970_ALPHA_I_18O_T0=-0.028224,
    VAN_HOOK_1968_ALPHA_I_2H_A=11484.5,
    VAN_HOOK_1968_ALPHA_I_2H_B=35.3315,
    VAN_HOOK_1968_ALPHA_I_2H_C=-0.159290,
    VAN_HOOK_1968_ALPHA_L_2H_A=26398.8,
    VAN_HOOK_1968_ALPHA_L_2H_B=-89.6065,
    VAN_HOOK_1968_ALPHA_L_2H_C=0.075802,
    VAN_HOOK_1968_ALPHA_I_18O_A=1740.59,
    VAN_HOOK_1968_ALPHA_I_18O_B=2.2965,
    VAN_HOOK_1968_ALPHA_I_18O_C=-0.005793,
    VAN_HOOK_1968_ALPHA_L_18O_A=1991.1,
    VAN_HOOK_1968_ALPHA_L_18O_B=-4.1887,
    VAN_HOOK_1968_ALPHA_L_18O_C=0.001197,
    VAN_HOOK_1968_ALPHA_I_17O_A=933.651,
    VAN_HOOK_1968_ALPHA_I_17O_B=1.0953,
    VAN_HOOK_1968_ALPHA_I_17O_C=-0.002805,
    VAN_HOOK_1968_ALPHA_L_17O_A=1057.8,
    VAN_HOOK_1968_ALPHA_L_17O_B=-2.24,
    VAN_HOOK_1968_ALPHA_L_17O_C=0.000668,
    VAN_HOOK_1968_ALPHA_I_3H_A=18464.5,
    VAN_HOOK_1968_ALPHA_I_3H_B=31.0436,
    VAN_HOOK_1968_ALPHA_I_3H_C=-0.20752,
    VAN_HOOK_1968_ALPHA_L_3H_A=37813.2,
    VAN_HOOK_1968_ALPHA_L_3H_B=-136.751,
    VAN_HOOK_1968_ALPHA_L_3H_C=0.124096,
    VAN_HOOK_1968_ALPHA_I_TOT_A=33453.7,
    VAN_HOOK_1968_ALPHA_I_TOT_B=62.4058,
    VAN_HOOK_1968_ALPHA_I_TOT_C=-0.395542,
    VAN_HOOK_1968_ALPHA_L_TOT_A=68702.3,
    VAN_HOOK_1968_ALPHA_L_TOT_B=-244.687,
    VAN_HOOK_1968_ALPHA_L_TOT_C=0.224388,
    VAN_HOOK_1968_ALPHA_I_DOT_A=27722.4,
    VAN_HOOK_1968_ALPHA_I_DOT_B=66.5930,
    VAN_HOOK_1968_ALPHA_I_DOT_C=-0.351698,
    VAN_HOOK_1968_ALPHA_L_DOT_A=59313.4,
    VAN_HOOK_1968_ALPHA_L_DOT_B=-204.941,
    VAN_HOOK_1968_ALPHA_L_DOT_C=0.182686,
    VAN_HOOK_1968_ALPHA_I_DOD_A=21577.6,
    VAN_HOOK_1968_ALPHA_I_DOD_B=69.3358,
    VAN_HOOK_1968_ALPHA_I_DOD_C=-0.305394,
    VAN_HOOK_1968_ALPHA_L_DOD_A=49314.9,
    VAN_HOOK_1968_ALPHA_L_DOD_B=-164.266,
    VAN_HOOK_1968_ALPHA_L_DOD_C=0.140049,
    HORITA_AND_WESOLOWSKI_1994_ALPHA_L_18O_T3=1e-3 * 0.35041e9,
    HORITA_AND_WESOLOWSKI_1994_ALPHA_L_18O_T2=1e-3 * -1.6664e6,
    HORITA_AND_WESOLOWSKI_1994_ALPHA_L_18O_T1=1e-3 * 6.7123e3,
    HORITA_AND_WESOLOWSKI_1994_ALPHA_L_18O_T0=1e-3 * -7.685,
    HORITA_AND_WESOLOWSKI_1994_ALPHA_L_2H_T3=1e-3 * 2.9992e9,
    HORITA_AND_WESOLOWSKI_1994_ALPHA_L_2H_T_0=1e-3 * -161.04,
    HORITA_AND_WESOLOWSKI_1994_ALPHA_L_2H_T_1=1e-3 * 794.84e-3,
    HORITA_AND_WESOLOWSKI_1994_ALPHA_L_2H_T_2=1e-3 * -1620.1e-6,
    HORITA_AND_WESOLOWSKI_1994_ALPHA_L_2H_T_3=1e-3 * 1158.8e-9,
    BARKAN_AND_LUZ_2005_EXPONENT=0.529,
    BARKAN_AND_LUZ_2007_EXCESS_18O_COEFF=0.528,
    CRAIG_1961_SLOPE_COEFF=8.0,
    CRAIG_1961_INTERCEPT_COEFF=10 * PER_MILLE,
    # ice shape
    capacity_columnar_ice_B1=0.3,
    capacity_columnar_ice_B2=0.43,
    capacity_columnar_ice_A1=0.015755,
    capacity_columnar_ice_A2=0.33565,
    columnar_ice_mass_transition=2.146e-13,
    columnar_ice_length_beta_1=3.0,
    columnar_ice_length_beta_2=2.2,
    columnar_ice_length_alpha_1=526.1,
    columnar_ice_length_alpha_2=0.04142,
    columnar_bulk_ice_density=0.81e3,
    # optics
    asymmetry_g=0.85,
    # ventilation (Pruppacher & Rasmussen 1979, Froessling 1938)
    PRUPPACHER_RASMUSSEN_1979_XTHRES=1.4,
    PRUPPACHER_RASMUSSEN_1979_CONSTSMALL=1.0,
    PRUPPACHER_RASMUSSEN_1979_COEFFSMALL=0.108,
    PRUPPACHER_RASMUSSEN_1979_POWSMALL=2.0,
    PRUPPACHER_RASMUSSEN_1979_CONSTBIG=0.78,
    PRUPPACHER_RASMUSSEN_1979_COEFFBIG=0.308,
    FROESSLING_1938_A=1.0,
    FROESSLING_1938_B=0.276,
    # air dynamic viscosity (Zografos et al. 1987)
    ZOGRAFOS_1987_COEFF_T3=2.5914e-15,
    ZOGRAFOS_1987_COEFF_T2=-1.4346e-11,
    ZOGRAFOS_1987_COEFF_T1=5.0523e-8,
    ZOGRAFOS_1987_COEFF_T0=4.1130e-6,
    # isotope diffusivity (Hellmann & Harvey 2020)
    HELLMANN_HARVEY_T_UNIT=100.0 * si.K,
    HELLMANN_HARVEY_EQ6_COEFF0=0.98258,
    HELLMANN_HARVEY_EQ6_COEFF1=-0.02546,
    HELLMANN_HARVEY_EQ6_COEFF2=0.02421,
    HELLMANN_HARVEY_EQ7_COEFF0=0.98284,
    HELLMANN_HARVEY_EQ7_COEFF1=0.003517,
    HELLMANN_HARVEY_EQ7_COEFF2=-0.001996,
    HELLMANN_HARVEY_EQ8_COEFF0=0.96671,
    HELLMANN_HARVEY_EQ8_COEFF1=0.007406,
    HELLMANN_HARVEY_EQ8_COEFF2=-0.004861,
    # terminal velocity (Rogers & Yau 1989)
    ROGERS_YAU_TERM_VEL_SMALL_K=1.19e6 / si.cm,
    ROGERS_YAU_TERM_VEL_MEDIUM_K=8e3,
    ROGERS_YAU_TERM_VEL_LARGE_K=2.01e3 * si.cm**0.5,
    ROGERS_YAU_TERM_VEL_SMALL_R_LIMIT=35 * si.um,
    ROGERS_YAU_TERM_VEL_MEDIUM_R_LIMIT=600 * si.um,
    # misc
    celestial_body_radius=math.nan,
    bulk_phase_partitioning_T_cold=235.0,
    bulk_phase_partitioning_T_warm=273.0,
    bulk_phase_partitioning_exponent=math.nan,
    BOLIN_ISOTOPE_TIMESCALE_COEFF_C1=math.nan,
    PICCIOTTO_18O_A=-0.9 * PER_MILLE,
    PICCIOTTO_18O_B=6.4 * PER_MILLE,
    PICCIOTTO_2H_A=-0.8 * PER_CENT,
    PICCIOTTO_2H_B=8 * PER_CENT,
    PICCIOTTO_18O_TO_2H_SLOPE_COEFF=0.8 * PER_CENT / PER_MILLE,
    PICCIOTTO_18O_TO_2H_INTERCEPT_COEFF=-1.8 * PER_CENT,
)


def _mixing_ratio_to_specific_content(mixing_ratio):
    return mixing_ratio / (1 + mixing_ratio)


def compute_derived_values(c: dict):
    """derived quantities (reference ``constants_defaults.py:728-775``);
    water molar mass from isotopic composition per IAPWS guidelines"""
    c["M_1H2_16O"] = c["M_1H"] * 2 + c["M_16O"]
    c["M_2H_1H_16O"] = c["M_2H"] + c["M_1H"] + c["M_16O"]
    c["M_3H_1H_16O"] = c["M_3H"] + c["M_1H"] + c["M_16O"]
    c["M_1H2_17O"] = c["M_1H"] * 2 + c["M_17O"]
    c["M_1H2_18O"] = c["M_1H"] * 2 + c["M_18O"]

    c["Mv"] = (
        (
            1
            - 2 * _mixing_ratio_to_specific_content(c["VSMOW_R_2H"])
            - 2 * _mixing_ratio_to_specific_content(c["VSMOW_R_3H"])
            - 1 * _mixing_ratio_to_specific_content(c["VSMOW_R_17O"])
            - 1 * _mixing_ratio_to_specific_content(c["VSMOW_R_18O"])
        )
        * c["M_1H2_16O"]
        + 2 * _mixing_ratio_to_specific_content(c["VSMOW_R_2H"]) * c["M_2H_1H_16O"]
        + 2 * _mixing_ratio_to_specific_content(c["VSMOW_R_3H"]) * c["M_3H_1H_16O"]
        + 1 * _mixing_ratio_to_specific_content(c["VSMOW_R_17O"]) * c["M_1H2_17O"]
        + 1 * _mixing_ratio_to_specific_content(c["VSMOW_R_18O"]) * c["M_1H2_18O"]
    )

    c["eps"] = c["Mv"] / c["Md"]
    c["Rd"] = c["R_str"] / c["Md"]
    c["Rv"] = c["R_str"] / c["Mv"]
    c["Rd_over_c_pd"] = c["Rd"] / c["c_pd"]
    c["water_molar_volume"] = c["Mv"] / c["rho_w"]
    c["rho_STP"] = c["p_STP"] / c["Rd"] / c["T_STP"]
    c["H_u"] = c["M"] / c["p_STP"]
    c["l_tri"] = c["L_tri"] / c["Mv"]


_CONSTANTS_CLS_CACHE = {}


def make_constants(overrides: dict = None):
    """build a frozen constants namespace (namedtuple) from defaults + overrides"""
    values = dict(DEFAULTS)
    if overrides:
        for key in overrides:
            if key not in values and key not in (
                "Mv",
                "eps",
                "Rd",
                "Rv",
                "Rd_over_c_pd",
                "water_molar_volume",
                "rho_STP",
                "H_u",
                "l_tri",
            ):
                raise ValueError(f"constant override provided for unknown key: {key}")
        values.update(overrides)
    compute_derived_values(values)
    if overrides:  # allow overriding derived values too (reference semantics)
        for key, val in overrides.items():
            values[key] = val
    names = tuple(sorted(values.keys()))
    if names not in _CONSTANTS_CLS_CACHE:
        _CONSTANTS_CLS_CACHE[names] = namedtuple("Constants", names)
    return _CONSTANTS_CLS_CACHE[names](**{k: values[k] for k in names})
