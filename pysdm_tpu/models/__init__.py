"""Ready-made paper-reproduction configurations — the counterpart of the
reference's examples/app layer (``examples/PySDM_examples/``, SURVEY.md L12).

All 48 reference example dirs are covered:

Box coalescence/breakup:   shima_et_al_2009, berry_1967,
                           dejong_mackay_et_al_2023, srivastava_1982,
                           bieli_et_al_2022, dejong_azimi
Adiabatic parcel:          pyrcel, abdul_razzak_ghan_2000, lowe_et_al_2019,
                           kreidenweis_et_al_2003 (aqueous chemistry),
                           jaruga_and_pawlowska_2018 (chemistry convergence),
                           grabowski_and_pawlowska_2023 (ripening),
                           niedermeier_et_al_2014 (immersion freezing),
                           arabas_and_shima_2017, yang_et_al_2018,
                           jensen_and_nugent_2017, rogers_1975 (ODE study)
Mixed-phase parcel:        spichtinger_et_al_2023 (cirrus, homogeneous),
                           abade_and_albuquerque_2024 (WBF glaciation)
Freezing box:              alpert_and_knopf_2016, arabas_et_al_2025
                           (singular vs ABIFM cooling-rate study)
1D kinematic column:       shipway_and_hill_2012
2D kinematic warm rain:    arabas_et_al_2015 (flagship),
                           morrison_and_grabowski_2007 (strato-cumulus
                           base + mixed-phase toggle)
Aerosol composition:       singer_ward (organic-film Koehler curves),
                           ervens_and_feingold_2012 (CCN spectrum)
Benchmark harness:         bartman_et_al_2021, thesis_benchmarks
                           (Bartman 2020, Bulenok 2023)
Seeding:                   seeding
Isotope formula studies:   isotopes, isotope_papers (Bolin 1958, Miyake 1968,
                           Stewart 1975, Pruppacher & Rasmussen 1979,
                           Fisher 1991, Bolot 2013, Lamb 2017, Graf 2019,
                           Toon 1980, Zaba et al., Kinzer & Gunn 1951,
                           Pierchala 2022), merlivat_and_nief_1967,
                           van_hook_1968, gonfiantini_1986,
                           jouzel_and_merlivat_1984,
                           gedzelman_and_arnold_1994
Isotope multibox:          rozanski_and_sonntag_1982
"""

from . import (
    abade_and_albuquerque_2024,
    abdul_razzak_ghan_2000,
    arabas_and_shima_2017,
    alpert_and_knopf_2016,
    arabas_et_al_2015,
    arabas_et_al_2025,
    bartman_et_al_2021,
    berry_1967,
    dejong_mackay_et_al_2023,
    bieli_et_al_2022,
    dejong_azimi,
    ervens_and_feingold_2012,
    gedzelman_and_arnold_1994,
    gonfiantini_1986,
    grabowski_and_pawlowska_2023,
    isotope_papers,
    jaruga_and_pawlowska_2018,
    jensen_and_nugent_2017,
    jouzel_and_merlivat_1984,
    kreidenweis_et_al_2003,
    lowe_et_al_2019,
    merlivat_and_nief_1967,
    morrison_and_grabowski_2007,
    niedermeier_et_al_2014,
    pyrcel,
    rogers_1975,
    rozanski_and_sonntag_1982,
    seeding,
    shima_et_al_2009,
    shipway_and_hill_2012,
    singer_ward,
    spichtinger_et_al_2023,
    srivastava_1982,
    thesis_benchmarks,
    van_hook_1968,
    yang_et_al_2018,
)
