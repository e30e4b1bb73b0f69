"""Oracle tables: frequency/direction grids and derived constants.

Transcribes:
  - yowpcons.F90:19-66   physical constant literals
  - mfr.F90:42-49        geometric frequency ladder
  - mfredir.F90:90-135   directions + trapezoidal DFIM weights
  - initmdl.F90:435-500  derived weights (DFIMOFR/.., COFRM4, FLMAX,
                         RHOWG_DFIM, FLOGSPRDM1)
  - yowfred.F90:50-56    tail constants
"""

from __future__ import annotations

import math
import types

import numpy as np

# yowpcons.F90 literals (the reference hard-codes these decimals)
G = 9.806
GM1 = 0.101978381
PI = 3.1415927
ZPI = 6.2831854
ZPI4GM1 = 158.93794172
ZPI4GM2 = 16.208233910
DEG = 57.295778667
RAD = 0.017453293
EPSMIN = 0.1e-32
EPSUS = 1.0e-6
ROWATER = 1000.0
ROWATERM1 = 0.001
ROAIR = 1.225
ACD = 8.0e-4
BCD = 8.0e-5
ACDLIN = 0.0008
BCDLIN = 0.00047
CDMAX = 0.0025

# yowfred.F90:50-56,81
FRATIO = 1.1
WETAIL = 0.25
FRTAIL = 0.2
WP1TAIL = 1.0 / 3.0
COEF4 = 5.0e-07
FRIC = 28.0


def build(nang: int, nfre: int, *, ifre1: int = 3, fr1: float = 0.04177248,
          alphapmax: float = 0.03):
    """Build the frequency/direction tables as a SimpleNamespace."""
    # mfr.F90:42-49
    fr = np.zeros(nfre)
    fr[ifre1 - 1] = fr1
    for m in range(ifre1 - 1, 0, -1):          # DO M=IFRE1-1,1,-1
        fr[m - 1] = fr[m] / FRATIO
    for m in range(ifre1 + 1, nfre + 1):       # DO M=IFRE1+1,NFRE
        fr[m - 1] = FRATIO * fr[m - 2]

    # mfredir.F90:112-131
    delth = ZPI / float(nang)
    th = np.array([(k - 1) * delth + 0.5 * delth for k in range(1, nang + 1)])
    co1 = 0.5 * (FRATIO - 1.0) * delth
    dfim = np.zeros(nfre)
    dfim[0] = co1 * fr[0]
    for m in range(2, nfre):                   # DO M=2,NFRE-1
        dfim[m - 1] = co1 * (fr[m - 1] + fr[m - 2])
    dfim[nfre - 1] = co1 * fr[nfre - 2]

    # initmdl.F90:444-500
    dfimofr = dfim / fr
    dfimfr = dfim * fr
    dfimfr2 = dfim * fr**2
    zpifr = ZPI * fr
    fr5 = fr**5
    frm5 = 1.0 / fr5
    cofrm4 = COEF4 * G / fr**4
    flmax = (alphapmax / PI) / (ZPI4GM2 * fr5)
    flogsprdm1 = 1.0 / math.log10(FRATIO)
    xlogfratio = math.log(FRATIO)
    rhowg_dfim = ROWATER * G * delth * xlogfratio * fr
    rhowg_dfim[0] *= 0.5
    rhowg_dfim[-1] *= 0.5

    return types.SimpleNamespace(
        nang=nang, nfre=nfre, fr=fr, th=th, costh=np.cos(th),
        sinth=np.sin(th), delth=delth, dfim=dfim, dfimofr=dfimofr,
        dfimfr=dfimfr, dfimfr2=dfimfr2, zpifr=zpifr, fr5=fr5, frm5=frm5,
        cofrm4=cofrm4, flmax=flmax, flogsprdm1=flogsprdm1,
        xlogfratio=xlogfratio, rhowg_dfim=rhowg_dfim)
