"""Ready-made paper-reproduction configurations — the counterpart of the
reference's examples/app layer (``examples/PySDM_examples/``, SURVEY.md L12).

Box coalescence/breakup:   shima_et_al_2009, berry_1967,
                           dejong_mackay_et_al_2023
Adiabatic parcel:          pyrcel, abdul_razzak_ghan_2000, lowe_et_al_2019,
                           kreidenweis_et_al_2003 (aqueous chemistry),
                           jaruga_and_pawlowska_2018 (chemistry convergence),
                           grabowski_and_pawlowska_2023 (ripening),
                           niedermeier_et_al_2014 (immersion freezing)
Freezing box:              alpert_and_knopf_2016
1D kinematic column:       shipway_and_hill_2012
2D kinematic warm rain:    arabas_et_al_2015 (flagship)
Benchmark harness:         bartman_et_al_2021
"""

from . import (
    abdul_razzak_ghan_2000,
    arabas_and_shima_2017,
    alpert_and_knopf_2016,
    arabas_et_al_2015,
    bartman_et_al_2021,
    berry_1967,
    dejong_mackay_et_al_2023,
    bieli_et_al_2022,
    grabowski_and_pawlowska_2023,
    jaruga_and_pawlowska_2018,
    jensen_and_nugent_2017,
    kreidenweis_et_al_2003,
    lowe_et_al_2019,
    niedermeier_et_al_2014,
    pyrcel,
    seeding,
    shima_et_al_2009,
    shipway_and_hill_2012,
    yang_et_al_2018,
)
