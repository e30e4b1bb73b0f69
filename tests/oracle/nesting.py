"""Loop-for-loop f64 transcriptions of the boundary-interpolation
kernels (rotspec.F90:70-88, strspec.F90:70-180, intspec.F90:110-230)
used only as golden fixtures for tests/test_nesting.py."""

import numpy as np

ZPI = 2.0 * np.pi


def rotspec_ref(f1, rthet):
    """rotspec.F90: F3(K,M) = BDIF*F1(KC,M) + ADIF*F1(KC1,M)."""
    kl, ml = f1.shape
    f3 = np.zeros_like(f1)
    fth = np.mod(rthet + ZPI, ZPI) * kl / ZPI
    inc = int(fth)
    adif = fth - inc
    bdif = 1.0 - adif
    for k in range(1, kl + 1):
        kc = k - inc
        if kc < 1:
            kc += kl
        kc1 = kc - 1
        if kc1 < 1:
            kc1 += kl
        for m in range(ml):
            f3[k - 1, m] = bdif * f1[kc - 1, m] + adif * f1[kc1 - 1, m]
    return f3


def strspec_ref(fl_in, gamma, fr):
    """strspec.F90 with the reference's literal base 1.1."""
    fl = fl_in.copy()
    kl, ml = fl.shape
    if gamma == 1.0:
        return fl
    ar1 = np.zeros_like(fl)
    alo = np.log10(1.1)
    gams = gamma
    inc = int(np.log10(gams) / alo)
    z = abs(1.1 ** inc - gams)
    ar2 = fr[:ml] * gams
    if z <= 0.001:
        if gams > 1.0:
            for m in range(1, ml - inc + 1):
                mc = m + inc
                for k in range(kl):
                    ar1[k, m - 1] = fl[k, mc - 1]
        else:
            for m in range(1 - inc, ml + 1):
                mc = m + inc
                for k in range(kl):
                    ar1[k, m - 1] = fl[k, mc - 1]
    else:
        if gams > 1.0:
            for m in range(1, ml - inc):
                ifr = int(np.log10(ar2[m - 1] / fr[0]) / alo + 1.0)
                ifrp1 = ifr + 1
                mc = m + inc
                adif = (fr[ifrp1 - 1] - ar2[m - 1]) / \
                    (fr[ifrp1 - 1] - fr[ifr - 1])
                bdif = 1.0 - adif
                for k in range(kl):
                    ar1[k, m - 1] = adif * fl[k, mc - 1] + \
                        bdif * fl[k, mc]
        else:
            for m in range(2 - inc, ml + 1):
                ifr = int(np.log10(ar2[m - 1] / fr[0]) / alo + 1.0)
                ifrp1 = ifr + 1
                mc = m + inc - 1
                adif = (fr[ifrp1 - 1] - ar2[m - 1]) / \
                    (fr[ifrp1 - 1] - fr[ifr - 1])
                bdif = 1.0 - adif
                for k in range(kl):
                    ar1[k, m - 1] = adif * fl[k, mc - 1] + \
                        bdif * fl[k, mc]
    return ar1


def intspec_ref(fr, del12, del1l, f1, fm1, em1, th1, f2, fm2, em2, th2):
    """intspec.F90:110-230 for one spectrum pair ((nang, nfre))."""
    gw1 = (del12 - del1l) / del12
    gw2 = del1l / del12
    if em1 == 0.0:
        return gw2 * f2, gw2 * em2, fm2, th2
    if em2 == 0.0:
        return gw1 * f1, gw1 * em1, fm1, th1
    em = gw1 * em1 + gw2 * em2
    fm = gw1 * fm1 + gw2 * fm2
    cm = gw1 * np.cos(th1) + gw2 * np.cos(th2)
    sm = gw1 * np.sin(th1) + gw2 * np.sin(th2)
    thetm = np.mod(np.arctan2(sm, cm) + ZPI, ZPI)
    f3 = strspec_ref(rotspec_ref(f1, thetm - th1), fm1 / fm, fr)
    f3 = f3 * (em / em1)
    f4 = strspec_ref(rotspec_ref(f2, thetm - th2), fm2 / fm, fr)
    f4 = f4 * (em / em2)
    return gw1 * f3 + gw2 * f4, em, fm, thetm
