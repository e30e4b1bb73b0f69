"""Oracle: the complete physics step (IMPLSCH + SINFLX chain).

Composes the per-kernel oracles in the exact reference order
(implsch.F90:177-468, sinflx.F90:86-184): depth limit → means → 2×SINFLX
(stress/input iteration) → SDISSIP → SNONLIN (SSOURCE capture) → SDIWBK →
SBOTTOM → semi-implicit update + limiter/floor/cap → WNFLUXES → means →
IMPHFTAIL → SETICE → Stokes drift.

Covers the default configuration: ICODE=3 wind forcing, LLGCBZ0=F,
LICERUN/LMASKICE=T, LCFLX+LWVFLX_SNL=T, no SDICE, LBIWBK=T, XIMP=1.
"""

from __future__ import annotations

import numpy as np

from . import reftables as rt
from . import means as omeans
from . import shallow as oshallow
from . import snl as osnl
from . import srcterms as osrc
from . import fluxmisc as ofx

FLMIN = 0.00001
WSEMEAN_MIN = 0.001


def sinflx(icall, ncall, fl1, wavnum, cinv, xk2cg, wswave, wdwave, aird,
           raorw, wstar, cicover, coswdif, sinwdif2, fmean, halp, flm,
           ufric, tauw, tauwdir, z0m, z0b, chrnck, tb, p, swellft,
           x0tauhf, wtauhf):
    """sinflx.F90:86-184 (LUPDTUS=T, standalone ICODE=3)."""
    iusfg = 0 if icall == 1 else 1
    if p.llnormagam and p.llcapchnk:
        rnfac = 1.0 + p.dthrn_a * (1.0 + np.tanh(wswave - p.dthrn_u))
    else:
        rnfac = np.ones_like(wswave)

    if icall == 1:
        fl1 = fl1.copy()
        fl1[:, :, -1] = np.maximum(fl1[:, :, -1], flm)
        if p.llgcbz0:
            halp = ofx.halphap(fl1, wavnum, coswdif, tb,
                               alphapmax=p.alphapmax)
        else:
            halp = np.zeros_like(fmean)

    ustar, z0m, z0b, chrnck = osrc.taut_z0(
        iusfg, halp, wswave, wdwave, tauw, tauwdir, rnfac, ufric, p)

    ngst = 1 if icall < ncall else 2
    llsneg = icall >= ncall
    llphiwa = icall >= ncall

    sinput = osrc.sinput_ard if p.iphys == 1 else osrc.sinput_jan
    args = (ngst, llsneg, fl1, wavnum, cinv, xk2cg, wdwave, wswave,
            ustar, z0m, coswdif, sinwdif2, raorw, wstar, rnfac, tb, p)
    if p.iphys == 1:
        fld, sl, spos, xllws = osrc.sinput_ard(*args, swellft)
    else:
        fld, sl, spos, xllws = osrc.sinput_jan(*args)

    _, fmeanws = ofx_femeanws(fl1, xllws, tb)
    mij, rhowgdfth = omeans.frcutindex(
        fmean, fmeanws, ustar, cicover, tb,
        tailfactor=p.tailfactor, tailfactor_pm=p.tailfactor_pm)
    tauw, tauwdir, phiwa = osrc.stresso(
        fl1, sl, spos, cinv, mij, rhowgdfth, wdwave, ustar, z0m, aird,
        rnfac, coswdif, sinwdif2, tb, p, x0tauhf, wtauhf, llphiwa,
        gamnconst=p.gamnconst())
    return dict(fl1=fl1, ufric=ustar, tauw=tauw, tauwdir=tauwdir,
                z0m=z0m, z0b=z0b, chrnck=chrnck, halp=halp,
                fld=fld, sl=sl, spos=spos, xllws=xllws, mij=mij,
                rhowgdfth=rhowgdfth, fmeanws=fmeanws, phiwa=phiwa)


def ofx_femeanws(fl1, xllws, tb):
    em, fm = omeans.femeanws(fl1, xllws, tb)
    return em, fm


def implsch(fl1, wavnum, cgroup, xk2cg, cinv, stokfac, depth, emaxdpt,
            wswave, wdwave, aird, wstar, cicover,
            ufric, tauw, tauwdir, z0m, z0b, chrnck,
            tb, p, *, idelt, swellft, x0tauhf, wtauhf, nfre_red,
            alphapmax):
    """implsch.F90:177-468 → (fl1_new, state dict)."""
    npts, nang, nfre = fl1.shape
    delt = idelt
    delt5 = delt                    # XIMP = 1
    raorw = np.maximum(aird, 1.0) * rt.ROWATERM1
    coswdif = np.cos(tb.th[None, :] - wdwave[:, None])
    sinwdif2 = np.sin(tb.th[None, :] - wdwave[:, None]) ** 2

    fl1 = oshallow_sdepthlim(emaxdpt, fl1, tb)
    emean, fmean, f1mean, akmean, xkmean = omeans.fkmean(fl1, wavnum, tb)

    flm = (1.0 - 0.9 * np.minimum(cicover, 0.99))[:, None] * FLMIN \
        * np.maximum(0.0, coswdif) ** 2

    halp = np.zeros(npts)
    st = None
    for icall in (1, 2):
        st = sinflx(icall, 2, fl1, wavnum, cinv, xk2cg, wswave, wdwave,
                    aird, raorw, wstar, cicover, coswdif, sinwdif2,
                    fmean, halp, flm, ufric, tauw, tauwdir, z0m, z0b,
                    chrnck, tb, p, swellft, x0tauhf, wtauhf)
        fl1, ufric, tauw, tauwdir = (st["fl1"], st["ufric"], st["tauw"],
                                     st["tauwdir"])
        z0m, z0b, chrnck, halp = (st["z0m"], st["z0b"], st["chrnck"],
                                  st["halp"])
    fld, sl = st["fld"], st["sl"]
    mij, xllws, fmeanws = st["mij"], st["xllws"], st["fmeanws"]

    if p.iphys == 1:
        fld, sl = ofx_sdissip_ard(fl1, fld, sl, wavnum, cgroup, xk2cg,
                                  ufric, coswdif, raorw, tb, p)
    else:
        fld, sl = ofx_sdissip_jan(fl1, fld, sl, wavnum, emean, f1mean,
                                  xkmean, tb, p)

    fld, sl = osnl.snonlin(fl1, fld, sl, wavnum, depth, akmean, tb,
                           isnonlin=1)
    gtemp1 = np.maximum(1.0 - delt5 * fld, 1.0)
    ssource = sl / gtemp1                  # LWVFLX_SNL (implsch.F90:294-306)

    fld, sl = oshallow.sdiwbk(fl1, fld, sl, depth, emaxdpt, emean,
                              f1mean, nfre_red)
    fld, sl = oshallow.sbottom(fl1, fld, sl, wavnum, depth, nfre_red)

    fl1, ssrc_cap = oshallow.implsch_update(
        fl1, fld, sl, ufric, fmean, fmeanws, flm, tb, idelt=idelt)
    ssource = ssource + ssrc_cap

    flux = ofx.wnfluxes(
        mij, st["rhowgdfth"], cinv, ssource, cicover, st["phiwa"],
        emean, f1mean, wswave, wdwave, ufric, aird, tb, p)

    emean, fmean, f1mean, akmean, xkmean = omeans.fkmean(fl1, wavnum, tb)
    emeanws, fmeanws = omeans.femeanws(fl1, xllws, tb)

    fl1 = omeans.imphftail(mij, flm, wavnum, xk2cg, fl1)

    wsemean = np.where(emeanws < WSEMEAN_MIN, WSEMEAN_MIN, emeanws)
    wsfmean = np.where(emeanws < WSEMEAN_MIN, 2.0 * tb.fr[-1], fmeanws)

    fl1 = ofx.setice(fl1, cicover, coswdif)

    ust, vst = ofx.stokesdrift(fl1, stokfac, wswave, wdwave, cicover, tb)

    state = dict(ufric=ufric, tauw=tauw, tauwdir=tauwdir, z0m=z0m,
                 z0b=z0b, chrnck=chrnck, mij=mij, phiwa=st["phiwa"],
                 emean=emean, fmean=fmean, f1mean=f1mean, akmean=akmean,
                 xkmean=xkmean, emeanws=emeanws, fmeanws=fmeanws,
                 wsemean=wsemean, wsfmean=wsfmean,
                 ustokes=ust, vstokes=vst, **flux)
    return fl1, state


def oshallow_sdepthlim(emaxdpt, fl1, tb):
    return omeans.sdepthlim(emaxdpt, fl1, tb)


def ofx_sdissip_ard(*a, **k):
    return osrc.sdissip_ard(*a, **k)


def ofx_sdissip_jan(*a, **k):
    return osrc.sdissip_jan(*a, **k)
