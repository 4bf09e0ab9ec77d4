"""Fragmentation functions (parity: reference
``PySDM/dynamics/collisions/breakup_fragmentations/``). Each returns
``(n_fragment, fragment_mass)`` per sorted slot given the pair's attributes
and a u01 draw. Basic limiters (NaN/zero/oversize fragments, reference
``fragmentation_methods.py:_fragmentation_limiters_body``) are applied
centrally in ``ops.breakup``; per-class vmin/nfmax limiting uses
``apply_limiters`` below with the reference's branch order."""

import numpy as np
import jax.numpy as jnp


def apply_limiters(frag_volume, total_volume, *, vmin=0.0, nfmax=None):
    """reference limiter order: clip fragment to the pair total; cap the
    fragment count at nfmax; fragments below vmin suppress breakup
    (fragment = whole pair)"""
    fv = jnp.where(
        jnp.isnan(frag_volume) | (frag_volume <= 0), total_volume, frag_volume
    )
    fv = jnp.minimum(fv, total_volume)
    if nfmax is not None:
        too_many = total_volume / fv > nfmax
        fv = jnp.where(too_many, total_volume / nfmax,
                       jnp.where(fv < vmin, total_volume, fv))
    else:
        fv = jnp.where(fv < vmin, total_volume, fv)
    return fv


class AlwaysN:
    required_attributes = ("water mass",)

    def __init__(self, n=1):
        self.n = n

    def register(self, builder):
        builder.request_attribute("water mass")

    def pairwise(self, formulae, attrs_a, attrs_b, u01):
        mass_sum = attrs_a["water mass"] + attrs_b["water mass"]
        n_fragment = jnp.full_like(mass_sum, float(self.n))
        return n_fragment, mass_sum / self.n


class ConstantMass:
    """every fragment has the prescribed mass"""

    required_attributes = ("water mass",)

    def __init__(self, c):
        self.c = c

    def register(self, builder):
        builder.request_attribute("water mass")

    def pairwise(self, formulae, attrs_a, attrs_b, u01):
        mass_sum = attrs_a["water mass"] + attrs_b["water mass"]
        fragment_mass = jnp.full_like(mass_sum, self.c)
        return mass_sum / fragment_mass, fragment_mass


class Exponential:
    """exponentially-distributed fragment size (reference expon_frag semantics)"""

    required_attributes = ("water mass",)

    def __init__(self, scale, vmin=0.0, nfmax=None):
        self.scale = scale  # volume scale
        self.vmin = vmin
        self.nfmax = nfmax

    def register(self, builder):
        builder.request_attribute("water mass")

    def pairwise(self, formulae, attrs_a, attrs_b, u01):
        const = formulae.constants
        mass_sum = attrs_a["water mass"] + attrs_b["water mass"]
        frag_volume = -self.scale * jnp.log(jnp.maximum(1 - u01, 1e-30))
        frag_volume = jnp.maximum(frag_volume, self.vmin)
        fragment_mass = frag_volume * const.rho_w
        n_fragment = mass_sum / jnp.maximum(fragment_mass, 1e-300)
        if self.nfmax is not None:
            n_fragment = jnp.minimum(n_fragment, self.nfmax)
            fragment_mass = mass_sum / n_fragment
        return n_fragment, fragment_mass


class Gaussian:
    """normally-distributed fragment volume"""

    required_attributes = ("water mass",)

    def __init__(self, mu, sigma, vmin=0.0, nfmax=None):
        self.mu = mu
        self.sigma = sigma
        self.vmin = vmin
        self.nfmax = nfmax

    def register(self, builder):
        builder.request_attribute("water mass")

    def pairwise(self, formulae, attrs_a, attrs_b, u01):
        const = formulae.constants
        mass_sum = attrs_a["water mass"] + attrs_b["water mass"]
        frag_volume = self.mu + self.sigma * formulae.trivia.erfinv_approx(
            jnp.clip(2 * u01 - 1, -0.999999, 0.999999)
        )
        frag_volume = jnp.maximum(frag_volume, self.vmin)
        fragment_mass = frag_volume * const.rho_w
        n_fragment = mass_sum / jnp.maximum(fragment_mass, 1e-300)
        if self.nfmax is not None:
            n_fragment = jnp.minimum(n_fragment, self.nfmax)
            fragment_mass = mass_sum / n_fragment
        return n_fragment, fragment_mass


class Feingold1988:
    """scaled exponential fragment-size pdf (Feingold et al. 1999; reference
    ``breakup_fragmentations/feingold1988.py``)"""

    required_attributes = ("water mass", "volume")

    def __init__(self, scale, fragtol=1e-3, vmin=0.0, nfmax=None):
        self.scale = scale
        self.fragtol = fragtol
        self.vmin = vmin
        self.nfmax = nfmax

    def register(self, builder):
        builder.request_attribute("volume")

    def pairwise(self, formulae, attrs_a, attrs_b, u01):
        const = formulae.constants
        x_plus_y = attrs_a["volume"] + attrs_b["volume"]
        frag_volume = -self.scale * jnp.log(
            jnp.maximum(1 - u01 * self.scale / x_plus_y, self.fragtol)
        )
        frag_volume = apply_limiters(
            frag_volume, x_plus_y, vmin=self.vmin, nfmax=self.nfmax
        )
        n_fragment = x_plus_y / frag_volume
        return n_fragment, frag_volume * const.rho_w


class SLAMS:
    """Stochastic Lagrangian Aggregates Model plankton-poop spectrum
    (Jokulsdottir & Archer 2016; reference ``breakup_fragmentations/slams.py``):
    P(n fragments) ~ 0.91 (n+2)^-1.56, n in 0..21"""

    required_attributes = ("water mass", "volume")

    def __init__(self, vmin=0.0, nfmax=None):
        self.vmin = vmin
        self.nfmax = nfmax
        probs = np.cumsum(0.91 * (np.arange(22) + 2.0) ** -1.56)
        self._cum_probs = probs

    def register(self, builder):
        builder.request_attribute("volume")

    def pairwise(self, formulae, attrs_a, attrs_b, u01):
        const = formulae.constants
        x_plus_y = attrs_a["volume"] + attrs_b["volume"]
        cum = jnp.asarray(self._cum_probs, dtype=u01.dtype)
        idx = jnp.searchsorted(cum, u01)  # first n with rand < cumprob
        n_fragment = jnp.where(idx < 22, idx + 2, 1).astype(u01.dtype)
        frag_volume = apply_limiters(
            x_plus_y / n_fragment, x_plus_y, vmin=self.vmin, nfmax=self.nfmax
        )
        return x_plus_y / frag_volume, frag_volume * const.rho_w


class Straub2010Nf:
    """Straub et al. 2010 four-mode fragment-size distribution (reference
    ``breakup_fragmentations/straub2010.py`` + ``fragmentation_methods.py``
    straub kernels): modes weighted by Nr1..Nr4(CW, gam) with the fourth
    mode's diameter fixed by mass conservation."""

    required_attributes = ("water mass", "volume", "radius", "relative fall velocity")

    def __init__(self, vmin=0.0, nfmax=None):
        self.vmin = vmin
        self.nfmax = nfmax

    def register(self, builder):
        builder.request_attribute("radius")
        builder.request_attribute("volume")
        builder.request_attribute("relative fall velocity")

    def pairwise(self, formulae, attrs_a, attrs_b, u01):
        const = formulae.constants
        va, vb = attrs_a["volume"], attrs_b["volume"]
        ra, rb = attrs_a["radius"], attrs_b["radius"]
        ua, ub = (
            attrs_a["relative fall velocity"],
            attrs_b["relative fall velocity"],
        )
        x_plus_y = va + vb
        v_max = jnp.maximum(va, vb)
        ds = 2 * jnp.minimum(ra, rb)
        gam = jnp.maximum(ra, rb) / jnp.maximum(jnp.minimum(ra, rb), 1e-30)
        Sc = const.PI * const.sgm_w * (6 / const.PI) ** (2 / 3) * x_plus_y ** (2 / 3)
        CKE = (
            const.rho_w
            / 2
            * (va * vb / jnp.maximum(x_plus_y, 1e-300))
            * (ua - ub) ** 2
        )
        We = CKE / jnp.maximum(Sc, 1e-300)
        CW = We * CKE / 1e-6  # CKE*We / microjoule (reference straub wrapper)

        # mode weights (reference ``straub_Nr``)
        Nr1 = jnp.where(gam * CW >= 7.0, 0.088 * (gam * CW - 7.0), 0.0)
        Nr2 = jnp.where(CW >= 21.0, 0.22 * (CW - 21.0), 0.0)
        Nr3 = jnp.where(
            CW >= 21.0, jnp.where(CW <= 46.0, 0.04 * (46.0 - CW), 0.0), 1.0
        )
        Nr4 = jnp.ones_like(CW)

        CM = 1e-2  # centimetre
        E_D1 = const.STRAUB_E_D1
        sigma1 = jnp.sqrt(
            jnp.log(jnp.maximum(CW / 64 / 100 * CM * CM / 12 / E_D1**2 + 1, 1.0))
        )
        mu1 = jnp.log(E_D1) - sigma1**2 / 2
        sigma2 = jnp.maximum(0.0, 7 * (CW - 21) * CM / 1000) / jnp.sqrt(12.0)
        mu2 = const.STRAUB_MU2
        sigma3 = (1 + 0.76 * jnp.sqrt(CW)) * CM / 100 / jnp.sqrt(12.0)
        mu3 = 0.9 * ds

        # mass remainder (reference ``straub_mass_remainder``)
        M1 = Nr1 * jnp.exp(3 * mu1 + 9 * sigma1**2 / 2)
        M2 = Nr2 * (mu2**3 + 3 * mu2 * sigma2**2)
        M3 = Nr3 * (mu3**3 + 3 * mu3 * sigma3**2)
        M4 = v_max * 6 / const.PI + ds**3 - M1 - M2 - M3
        d34 = jnp.where(M4 > 0, jnp.exp(jnp.log(jnp.maximum(M4, 1e-300)) / 3), 0.0)
        M4 = jnp.maximum(M4, 0.0)
        Nrt = M1 + M2 + M3 + M4

        safe_Nrt = jnp.maximum(Nrt, 1e-300)
        u = jnp.clip(u01, 1e-12, 1 - 1e-12)
        X1 = jnp.clip(u * safe_Nrt / jnp.maximum(M1, 1e-300), 1e-12, 1 - 1e-12)
        X2 = jnp.clip(
            (u * safe_Nrt - M1) / jnp.maximum(M2, 1e-300), 1e-12, 1 - 1e-12
        )
        X3 = jnp.clip(
            (u * safe_Nrt - M1 - M2) / jnp.maximum(M3, 1e-300), 1e-12, 1 - 1e-12
        )
        erfinv = formulae.trivia.erfinv_approx
        d_1 = jnp.exp(mu1 + jnp.sqrt(2.0) * sigma1 * erfinv(X1))
        d_2 = mu2 + jnp.sqrt(2.0) * sigma2 * erfinv(X2)
        d_3 = mu3 + jnp.sqrt(2.0) * sigma3 * erfinv(X3)
        diameter = jnp.where(
            u < M1 / safe_Nrt,
            d_1,
            jnp.where(
                u < (M1 + M2) / safe_Nrt,
                d_2,
                jnp.where(u < (M1 + M2 + M3) / safe_Nrt, d_3, d34),
            ),
        )
        diameter = jnp.where(Nrt > 0, diameter, 0.0)
        frag_volume = diameter**3 * const.PI / 6
        frag_volume = apply_limiters(
            frag_volume, x_plus_y, vmin=self.vmin, nfmax=self.nfmax
        )
        return x_plus_y / frag_volume, frag_volume * const.rho_w
