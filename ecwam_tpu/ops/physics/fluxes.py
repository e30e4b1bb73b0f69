"""Ocean-flux diagnostics: the WNFLUXES equivalent.

Computes the air→wave and wave→ocean energy/momentum fluxes from the
limited source-term contribution SSOURCE accumulated by the implicit
update (reference /root/reference/src/ecwam/wnfluxes.F90:150-340,
called from implsch.F90:399-414 when LCFLX).

Layout: spectra are (nang, nfre, npts); point fields are (npts,).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ecwam_tpu.core import constants as c

# fictitious normalised energy flux under sea ice (wnfluxes.F90:113-114)
PHIOC_ICE = -3.75
PHIAW_ICE = 3.75
# Hersbach 2011 CD(U10) bulk parametrisation (wnfluxes.F90:117-121)
_C1 = 1.03e-3
_C2 = 0.04e-3
_P1 = 1.48
_P2 = -0.21
_CDMAX = 0.003
# Hs limits under sea ice (wnfluxes.F90:120-121)
EFD_MIN = 0.0625
EFD_MAX = 6.25


def wnfluxes(ssource, cinv, rhowgdfth, cicover, phiwa,
             em, f1, wswave, wdwave, ufric, aird,
             tb, params, *,
             licerun: bool = True, lwamrsetci: bool = True,
             lciwa: bool = False, cithrsh: float = 0.3,
             ciblock: float = 0.0):
    """Wave energy/momentum fluxes to the ocean (wnfluxes.F90:150-340).

    ``ssource`` is the implicit-factor-modulated source term (nang, nfre,
    npts); ``rhowgdfth`` the ρw·g·Δf·Δθ trapezoid weights zeroed above the
    prognostic cut (nfre, npts).  Returns a dict of point fields.
    """
    dt = ssource.dtype
    epsus3 = c.EPSUS * jnp.sqrt(jnp.asarray(c.EPSUS, dt))

    if lciwa:
        zcithrs, cithrsh_inv, zmaxexp = 0.0, 50.0, 20.0
    else:
        zcithrs = ciblock
        cithrsh_inv = 1.0 / max(cithrsh, 0.01)
        zmaxexp = 10.0

    efd_fac = 4.0 * params.egrcrv / c.G**2
    ffd_fac = (params.egrcrv / params.afcrv) ** (1.0 / params.bfcrv) * c.G

    # pre-shaped in numpy: a (nang,)->(nang,1,1) reshape of a
    # traced value is the one layout cast Mosaic rejects
    sinth = jnp.asarray(np.asarray(tb.sinth)[:, None, None], dt)
    costh = jnp.asarray(np.asarray(tb.costh)[:, None, None], dt)

    # energy/momentum integrals of SSOURCE (wnfluxes.F90:199-221)
    sumt = jnp.sum(ssource, axis=0)                       # (nfre, npts)
    sumx = jnp.sum(sinth * ssource, axis=0)
    sumy = jnp.sum(costh * ssource, axis=0)
    philf = jnp.sum(sumt * rhowgdfth, axis=0)             # (npts,)
    cmrho = cinv * rhowgdfth
    xstress = jnp.sum(sumx * cmrho, axis=0)
    ystress = jnp.sum(sumy * cmrho, axis=0)

    # sea-ice adjusted u*, EM, F1 (wnfluxes.F90:223-259)
    if licerun and lwamrsetci:
        iced = cicover > zcithrs
        ooval_ice = jnp.exp(-jnp.minimum(
            (cicover * cithrsh_inv) ** 4, zmaxexp))
        u10p = jnp.maximum(wswave, c.EPSU10)
        cd_bulk = jnp.minimum((_C1 + _C2 * u10p**_P1) * u10p**_P2, _CDMAX)
        cd_wave = (ufric / u10p) ** 2
        cd_ice = ooval_ice * cd_wave + (1.0 - ooval_ice) * cd_bulk
        ustar_ice = jnp.maximum(jnp.sqrt(cd_ice) * u10p, c.EPSUS)
        efd = jnp.minimum(efd_fac * ustar_ice**4, EFD_MAX)
        em_oc_ice = jnp.maximum(
            ooval_ice * em + (1.0 - ooval_ice) * efd, EFD_MIN)
        ffd = ffd_fac / ustar_ice
        f1_oc_ice = jnp.clip(ooval_ice * f1 + (1.0 - ooval_ice) * ffd,
                             tb.fr[1], tb.fr[-1])
        ooval = jnp.where(iced, ooval_ice, 1.0).astype(dt)
        ustar = jnp.where(iced, ustar_ice, ufric)
        em_oc = jnp.where(iced, em_oc_ice, em)
        f1_oc = jnp.where(iced, f1_oc_ice, f1)
    else:
        ooval = jnp.ones_like(ufric)
        ustar = ufric
        em_oc = em
        f1_oc = f1

    # total and ocean stress (wnfluxes.F90:261-271)
    tau = aird * jnp.maximum(ustar**2, c.EPSUS)
    tauxd = tau * jnp.sin(wdwave)
    tauyd = tau * jnp.cos(wdwave)
    tauocxd = tauxd - ooval * xstress
    tauocyd = tauyd - ooval * ystress
    tauo = jnp.sqrt(tauocxd**2 + tauocyd**2)
    tauoc = jnp.clip(tauo / tau, c.TAUOCMIN, c.TAUOCMAX)

    # energy fluxes (wnfluxes.F90:297-313)
    xn = aird * jnp.maximum(ustar**3, epsus3)
    phiocd = ooval * (philf - phiwa) + (1.0 - ooval) * PHIOC_ICE * xn
    phieps = jnp.clip(phiocd / xn, c.PHIEPSMIN, c.PHIEPSMAX)
    phiocd = phieps * xn
    phiaw = ooval * phiwa / xn + (1.0 - ooval) * PHIAW_ICE

    return dict(
        tauxd=tauxd, tauyd=tauyd, tauocxd=tauocxd, tauocyd=tauocyd,
        tauoc=tauoc, phiocd=phiocd, phieps=phieps, phiaw=phiaw,
        em_oc=em_oc, f1_oc=f1_oc)
