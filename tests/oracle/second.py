"""Straight-line transcription of the second-order spectrum subsystem.

Sources: /root/reference/src/ecwam/second_order_lib.F90, vmin.F90,
vplus.F90, tables_2nd.F90, secondhh_gen.F90, secspom.F90,
cal_second_order_spec.F90.  Scalar nested loops, f64, test fixture only.
"""

import math

import numpy as np

G = 9.806
PI = 3.1415927
ZPI = 6.2831854


def nint(x):
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


def aki_scalar(om, dpth):
    """aki.F90 Newton iteration, scalar."""
    ebs = 1.0e-4
    dkmax = 40.0
    akm1 = om**2 / (4.0 * G)
    akm2 = om / (2.0 * math.sqrt(G * dpth))
    ao = max(akm1, akm2)
    if dpth * ao > dkmax:
        return om**2 / G
    for _ in range(200):
        bo = dpth * ao
        th = G * ao * math.tanh(bo)
        sth = math.sqrt(th)
        anew = ao + (om - sth) * sth * 2.0 / (th / ao + G * bo / math.cosh(bo) ** 2)
        if abs(ao - anew) <= ebs * anew:
            return anew
        ao = anew
    return ao


class Lib:
    """second_order_lib.F90 functions; dpth bound at construction."""

    def __init__(self, dpth):
        self.d = dpth

    def omeg(self, x):
        xk = abs(x)
        return math.sqrt(G * xk * math.tanh(xk * self.d))

    def vabs(self, xi, xj, thi, thj):
        arg = xi**2 + xj**2 + 2.0 * xi * xj * math.cos(thi - thj)
        return math.sqrt(arg) if arg > 0.0 else 0.0

    def vdir(self, xi, xj, thi, thj):
        y = xj * math.sin(thj - thi)
        x = xi + xj * math.cos(thj - thi)
        if x == 0.0:
            return 0.0
        return math.atan2(y, x) + thi

    def vmin(self, xi, xj, xk, thi, thj, thk):
        del1 = 1e-12
        zconst = 1.0 / (4.0 * math.sqrt(2.0))
        oi, oj, ok = self.omeg(xi) + del1, self.omeg(xj) + del1, self.omeg(xk) + del1
        qi, qj, qk = oi**2 / G, oj**2 / G, ok**2 / G
        rij = xi * xj * math.cos(thj - thi)
        rik = xi * xk * math.cos(thk - thi)
        rjk = xj * xk * math.cos(thk - thj)
        return zconst * ((rij - qi * qj) * math.sqrt(G * ok / (oi * oj))
                         + (rik - qi * qk) * math.sqrt(G * oj / (oi * ok))
                         + (rjk + qj * qk) * math.sqrt(G * oi / (oj * ok)))

    def vplus(self, xi, xj, xk, thi, thj, thk):
        del1 = 1e-12
        zconst = 1.0 / (4.0 * math.sqrt(2.0))
        oi, oj, ok = self.omeg(xi) + del1, self.omeg(xj) + del1, self.omeg(xk) + del1
        qi, qj, qk = oi**2 / G, oj**2 / G, ok**2 / G
        rij = xi * xj * math.cos(thj - thi)
        rik = xi * xk * math.cos(thk - thi)
        rjk = xj * xk * math.cos(thk - thj)
        return zconst * ((rij + qi * qj) * math.sqrt(G * ok / (oi * oj))
                         + (rik + qi * qk) * math.sqrt(G * oj / (oi * ok))
                         + (rjk + qj * qk) * math.sqrt(G * oi / (oj * ok)))

    def u(self, xi, xj, xk, xl, thi, thj, thk, thl):
        oi, oj, ok, ol = (self.omeg(xi), self.omeg(xj), self.omeg(xk),
                          self.omeg(xl))
        oik = self.omeg(self.vabs(xi, xk, thi, thk))
        ojk = self.omeg(self.vabs(xj, xk, thj, thk))
        oil = self.omeg(self.vabs(xi, xl, thi, thl))
        ojl = self.omeg(self.vabs(xj, xl, thj, thl))
        qi, qj = oi**2 / G, oj**2 / G
        qik, qjk, qil, qjl = oik**2 / G, ojk**2 / G, oil**2 / G, ojl**2 / G
        sqijkl = math.sqrt(ok * ol / (oi * oj))
        return (1.0 / 16.0) * sqijkl * (
            2.0 * (xi**2 * qj + xj**2 * qi) - qi * qj * (qik + qjk + qil + qjl))

    def w1(self, xi, xj, xk, xl, thi, thj, thk, thl):
        w = (-self.u(xi, xj, xk, xl, thi - PI, thj, thk, thl)
             - self.u(xi, xk, xj, xl, thi - PI, thk, thj, thl)
             - self.u(xi, xl, xj, xk, thi - PI, thl, thj, thk)
             + self.u(xj, xk, xi, xl, thj, thk, thi - PI, thl)
             + self.u(xj, xl, xi, xk, thj, thl, thi - PI, thk)
             + self.u(xk, xl, xi, xj, thk, thl, thi - PI, thj))
        return w / 3.0

    def w2(self, xi, xj, xk, xl, thi, thj, thk, thl):
        return (self.u(xi, xj, xk, xl, thi - PI, thj - PI, thk, thl)
                + self.u(xk, xl, xi, xj, thk, thl, thi - PI, thj - PI)
                - self.u(xk, xj, xi, xl, thk, thj - PI, thi - PI, thl)
                - self.u(xi, xk, xj, xl, thi - PI, thk, thj - PI, thl)
                - self.u(xi, xl, xk, xj, thi - PI, thl, thk, thj - PI)
                - self.u(xl, xj, xk, xi, thl, thj - PI, thk, thi - PI))

    def v2(self, xi, xj, xk, xl, thi, thj, thk, thl):
        del1 = 1e-5
        ri = xi + del1
        rj = xj + del1 / 2.0
        rk = xk + del1 / 3.0
        rl = xl + del1 * (1.0 + 1.0 / 2.0 - 1.0 / 3.0)
        oi, oj, ok, ol = (self.omeg(ri), self.omeg(rj), self.omeg(rk),
                          self.omeg(rl))
        rij, thij = self.vabs(ri, rj, thi, thj), self.vdir(ri, rj, thi, thj)
        rik, thik = (self.vabs(ri, rk, thi, thk - PI),
                     self.vdir(ri, rk, thi, thk - PI))
        rli = self.vabs(rl, ri, thl, thi - PI)
        thli = self.vdir(xl, xi, thl, thi - PI)
        rjl, thjl = (self.vabs(rj, rl, thj, thl - PI),
                     self.vdir(rj, rl, thj, thl - PI))
        rjk, thjk = (self.vabs(rj, rk, thj, thk - PI),
                     self.vdir(rj, rk, thj, thk - PI))
        rkl, thkl = self.vabs(rk, rl, thk, thl), self.vdir(rk, rl, thk, thl)
        oij, oik = self.omeg(rij), self.omeg(rik)
        ojl, ojk = self.omeg(rjl), self.omeg(rjk)
        oli, okl = self.omeg(rli), self.omeg(rkl)
        xnik = ok + oik - oi
        xnjl = oj + ojl - ol
        xnjk = ok + ojk - oj
        xnil = oi + oli - ol
        ynil = ol + oli - oi
        ynjk = oj + ojk - ok
        ynjl = ol + ojl - oj
        ynik = oi + oik - ok
        znij = oij - oi - oj
        znkl = okl - ok - ol
        zpij = oij + oi + oj
        zpkl = okl + ok + ol
        thlj, thil = thjl - PI, thli - PI
        thkj, thki = thjk - PI, thik - PI
        thji, thlk = thij - PI, thkl - PI
        v2 = (self.vmin(ri, rk, rik, thi, thk, thik)
              * self.vmin(rl, rj, rjl, thl, thj, thlj) * (1 / xnik + 1 / xnjl)
              + self.vmin(rj, rk, rjk, thj, thk, thjk)
              * self.vmin(rl, ri, rli, thl, thi, thli) * (1 / xnjk + 1 / xnil)
              + self.vmin(ri, rl, rli, thi, thl, thil)
              * self.vmin(rk, rj, rjk, thk, thj, thkj) * (1 / ynil + 1 / ynjk)
              + self.vmin(rj, rl, rjl, thj, thl, thjl)
              * self.vmin(rk, ri, rik, thk, thi, thki) * (1 / ynjl + 1 / ynik)
              + self.vmin(rij, ri, rj, thij, thi, thj)
              * self.vmin(rkl, rk, rl, thkl, thk, thl) * (1 / znij + 1 / znkl)
              + self.vplus(rij, ri, rj, thji, thi, thj)
              * self.vplus(rkl, rk, rl, thlk, thk, thl) * (1 / zpij + 1 / zpkl))
        return -v2

    def a1(self, xi, xj, xk, thi, thj, thk):
        del1 = 1e-8
        oi, oj, ok = (self.omeg(xi) + del1, self.omeg(xj) + del1,
                      self.omeg(xk) + del1)
        return -self.vmin(xi, xj, xk, thi, thj, thk) / (oi - oj - ok)

    def a2(self, xi, xj, xk, thi, thj, thk):
        return -2.0 * self.a1(xk, xj, xi, thk, thj, thi)

    def a3(self, xi, xj, xk, thi, thj, thk):
        del1 = 1e-8
        oi, oj, ok = (self.omeg(xi) + del1, self.omeg(xj) + del1,
                      self.omeg(xk) + del1)
        return -self.vplus(xi, xj, xk, thi, thj, thk) / (oi + oj + ok)

    def b2(self, xi, xj, xk, xl, thi, thj, thk, thl):
        rij, thij = self.vabs(xi, xj, thi, thj), self.vdir(xi, xj, thi, thj)
        rik, thik = (self.vabs(xi, xk, thi, thk - PI),
                     self.vdir(xi, xk, thi, thk - PI))
        rki, thki = (self.vabs(xk, xi, thk, thi - PI),
                     self.vdir(xk, xi, thk, thi - PI))
        ril, thil = (self.vabs(xi, xl, thi, thl - PI),
                     self.vdir(xi, xl, thi, thl - PI))
        rli, thli = (self.vabs(xl, xi, thl, thi - PI),
                     self.vdir(xl, xi, thl, thi - PI))
        rjl, thjl = (self.vabs(xj, xl, thj, thl - PI),
                     self.vdir(xj, xl, thj, thl - PI))
        rlj, thlj = (self.vabs(xl, xj, thl, thj - PI),
                     self.vdir(xl, xj, thl, thj - PI))
        rjk, thjk = (self.vabs(xj, xk, thj, thk - PI),
                     self.vdir(xj, xk, thj, thk - PI))
        rkj, thkj = (self.vabs(xk, xj, thk, thj - PI),
                     self.vdir(xk, xj, thk, thj - PI))
        rkl, thkl = self.vabs(xk, xl, thk, thl), self.vdir(xk, xl, thk, thl)
        return (self.a3(xi, xj, rij, thi, thj, thij - PI)
                * self.a3(xk, xl, rkl, thk, thl, thkl - PI)
                + self.a1(xj, xk, rjk, thj, thk, thjk)
                * self.a1(xl, xi, rli, thl, thi, thli)
                + self.a1(xj, xl, rjl, thj, thl, thjl)
                * self.a1(xk, xi, rki, thk, thi, thki)
                - self.a1(rij, xi, xj, thij, thi, thj)
                * self.a1(rkl, xk, xl, thkl, thk, thl)
                - self.a1(xi, xk, rik, thi, thk, thik)
                * self.a1(xl, xj, rlj, thl, thj, thlj)
                - self.a1(xi, xl, ril, thi, thl, thil)
                * self.a1(xk, xj, rkj, thk, thj, thkj))

    def b3(self, xi, xj, xk, xl, thi, thj, thk, thl):
        del1 = 1e-5
        oi, oj = self.omeg(xi) + del1, self.omeg(xj) + del1
        ok, ol = self.omeg(xk) + del1, self.omeg(xl) + del1
        rij, thij = self.vabs(xi, xj, thi, thj), self.vdir(xi, xj, thi, thj)
        rji, thji = self.vabs(xj, xi, thj, thi), self.vdir(xj, xi, thj, thi)
        rik, thik = self.vabs(xi, xk, thi, thk), self.vdir(xi, xk, thi, thk)
        rki, thki = self.vabs(xk, xi, thk, thi), self.vdir(xk, xi, thk, thi)
        rlj, thlj = (self.vabs(xl, xj, thl, thj - PI),
                     self.vdir(xl, xj, thl, thj - PI))
        rjl, thjl = (self.vabs(xj, xl, thj, thl - PI),
                     self.vdir(xj, xl, thj, thl - PI))
        rjk, thjk = self.vabs(xj, xk, thj, thk), self.vdir(xj, xk, thj, thk)
        rli, thli = (self.vabs(xl, xi, thl, thi - PI),
                     self.vdir(xl, xi, thl, thi - PI))
        ril, thil = (self.vabs(xi, xl, thi, thl - PI),
                     self.vdir(xi, xl, thi, thl - PI))
        rlk, thlk = (self.vabs(xl, xk, thl, thk - PI),
                     self.vdir(xl, xk, thl, thk - PI))
        rkl, thkl = (self.vabs(xk, xl, thk, thl - PI),
                     self.vdir(xk, xl, thk, thl - PI))
        zijkl = oi + oj + ok - ol
        return (-1.0 / zijkl) * (
            2.0 * (self.vmin(xl, xi, rli, thl, thi, thli)
                   * self.a1(rjk, xj, xk, thjk, thj, thk)
                   - self.vmin(rij, xi, xj, thij, thi, thj)
                   * self.a1(xl, xk, rlk, thl, thk, thlk)
                   - self.vmin(rik, xi, xk, thik, thi, thk)
                   * self.a1(xl, xj, rlj, thl, thj, thlj)
                   - self.vplus(xj, xi, rji, thj, thi, thji - PI)
                   * self.a1(xk, xl, rkl, thk, thl, thkl)
                   - self.vplus(xk, xi, rki, thk, thi, thki - PI)
                   * self.a1(xj, xl, rjl, thj, thl, thjl)
                   + self.vmin(xi, xl, ril, thi, thl, thil)
                   * self.a3(xj, xk, rjk, thj, thk, thjk - PI))
            + 3.0 * self.w1(xl, xk, xj, xi, thl, thk, thj, thi))

    def A(self, xi, xj, thi, thj):
        rk = self.vabs(xi, xj, thi, thj)
        thk = self.vdir(xi, xj, thi, thj)
        oi, oj, ok = self.omeg(xi), self.omeg(xj), self.omeg(rk)
        fi = math.sqrt(oi / (2.0 * G))
        fj = math.sqrt(oj / (2.0 * G))
        fk = math.sqrt(ok / (2.0 * G))
        return fk / (fi * fj) * (self.a1(rk, xi, xj, thk, thi, thj)
                                 + self.a3(rk, xi, xj, thk - PI, thi, thj))

    def B(self, xi, xj, thi, thj):
        rk = self.vabs(xj, xi, thj, thi - PI)
        thk = self.vdir(xj, xi, thj, thi - PI)
        oi, oj, ok = self.omeg(xi), self.omeg(xj), self.omeg(rk)
        fi = math.sqrt(oi / (2.0 * G))
        fj = math.sqrt(oj / (2.0 * G))
        fk = math.sqrt(ok / (2.0 * G))
        return 0.5 * fk / (fi * fj) * (self.a2(rk, xi, xj, thk, thi, thj)
                                       + self.a2(rk, xj, xi, thk - PI, thj, thi))

    def c_ql(self, xk0, xk1, th0, th1):
        om1 = self.omeg(xk1)
        f1 = math.sqrt(om1 / (2.0 * G))
        return (2.0 / f1**2) * (
            self.b2(xk0, xk1, xk1, xk0, th0, th1, th1, th0)
            + self.b3(xk0, xk0, xk1, xk1, th0 - PI, th0, th1, th1))


def tables_2nd(nfre, nang, ndepth, omstart, frac, xmr, dfdth, omega, th,
               deptha, depthd, aki_fn=aki_scalar):
    """tables_2nd.F90:107-186, 1-based loops → 0-based arrays."""
    mr = round(1.0 / xmr)
    ta = np.zeros((ndepth, nang, nfre, nfre))
    tb = np.zeros((ndepth, nang, nfre, nfre))
    tc_ql = np.zeros((ndepth, nang, nfre, nfre))
    tt_4m = np.zeros((ndepth, nang, nfre, nfre))
    tt_4p = np.zeros((ndepth, nang, nfre, nfre))
    im_p = np.zeros((nfre, nfre), dtype=int)
    im_m = np.zeros((nfre, nfre), dtype=int)
    tfak = np.zeros((nfre, ndepth))

    for jd in range(1, ndepth + 1):
        dpth = deptha * depthd ** (jd - 1)
        lib = Lib(dpth)
        for m in range(1, nfre + 1):
            tfak[m - 1, jd - 1] = aki_fn(omega[m - 1], dpth)
        th1 = th[nang - 1]
        for m in range(1, nfre + 1):
            om0 = omega[m - 1]
            xk0 = tfak[m - 1, jd - 1]
            mp = min(m + 1, nfre)
            xk0p = tfak[mp - 1, jd - 1]
            mm = max(m - 1, 1)
            xk0m = tfak[mm - 1, jd - 1]
            for m1 in range(1, nfre + 1):
                om1 = omega[m1 - 1]
                for ell in range(1, nang + 1):
                    th0 = th[ell - 1]
                    om2 = om0 - om1
                    if abs(om1) < om0 / 2.0:
                        xm2 = math.log(om2 / omstart) / math.log(1.0 + frac)
                        im_m[m1 - 1, m - 1] = nint(xmr * (xm2 + 1.0))
                        xk1 = tfak[m1 - 1, jd - 1]
                        xk2 = aki_fn(om2, dpth)
                        ta[jd - 1, ell - 1, m1 - 1, m - 1] = (
                            dfdth[m1 - 1] * lib.A(xk1, xk2, th1, th0) ** 2)
                    else:
                        ta[jd - 1, ell - 1, m1 - 1, m - 1] = 0.0
                        im_m[m1 - 1, m - 1] = 1
                    om2 = om1 + om0
                    xm2 = math.log(om2 / omstart) / math.log(1.0 + frac)
                    im_p[m1 - 1, m - 1] = nint(xmr * (xm2 + 1.0))
                    xk1 = tfak[m1 - 1, jd - 1]
                    xk2 = aki_fn(om2, dpth)
                    tb[jd - 1, ell - 1, m1 - 1, m - 1] = (
                        dfdth[m1 - 1] * lib.B(xk1, xk2, th1, th0) ** 2)
                    tc_ql[jd - 1, ell - 1, m1 - 1, m - 1] = (
                        dfdth[m1 - 1] * lib.c_ql(xk0, xk1, th0, th1))
                    fac = 2.0 * G / om1 * dfdth[m1 - 1]
                    tt_4m[jd - 1, ell - 1, m1 - 1, m - 1] = fac * (
                        lib.w2(xk0m, xk1, xk1, xk0m, th0, th1, th1, th0)
                        + lib.v2(xk0m, xk1, xk1, xk0m, th0, th1, th1, th0))
                    tt_4p[jd - 1, ell - 1, m1 - 1, m - 1] = fac * (
                        lib.w2(xk0p, xk1, xk1, xk0p, th0, th1, th1, th0)
                        + lib.v2(xk0p, xk1, xk1, xk0p, th0, th1, th1, th0))
    return ta, tb, tc_ql, tt_4m, tt_4p, im_p, im_m, tfak


def secspom(f1, nfre, nang, nmax, deptha, depthd, ndepth, omstart, frac, mr,
            dfdth, omega, depth, akmean, ta, tb, tc_ql, tt_4m, tt_4p,
            im_p, im_m):
    """secspom.F90:40-280 scalar transcription.

    f1: (npts, nang, nfre); tables 0-based with 1-based index content in
    im_p/im_m.  Returns F3 (npts, nang, nfre).
    """
    npts = f1.shape[0]
    jd = np.zeros(npts, dtype=int)
    xlogd = math.log(depthd)
    for ij in range(npts):
        xd = max(1.0 / akmean[ij], depth[ij])
        xd = math.log(xd / deptha) / xlogd + 1.0
        idx = max(nint(xd), 1)
        jd[ij] = min(idx, ndepth)

    omega_ext = np.zeros(nmax)
    f2 = np.zeros((npts, nang, nmax))
    omega_ext[:nfre] = omega[:nfre]
    f2[:, :, :nfre] = f1
    omg5 = omega[nfre - 1] ** 5
    for m in range(nfre + 1, nmax + 1):
        om0 = omstart * (1.0 + frac) ** (mr * m - 1)
        omega_ext[m - 1] = om0
        f2[:, :, m - 1] = (omg5 / om0**5) * f1[:, :, nfre - 1]

    ll = np.zeros((nang, nang), dtype=int)
    for k in range(1, nang + 1):
        for k1 in range(1, nang + 1):
            l = k - k1
            if l > nang:
                l -= nang
            if l < 1:
                l += nang
            ll[k1 - 1, k - 1] = l

    f3 = np.zeros((npts, nang, nfre))
    for m in range(1, nfre + 1):
        om0 = omega[m - 1]
        om0h = 0.5 * om0
        mp = min(m + 1, nmax)
        om0p = omega_ext[mp - 1]
        mm = max(m - 1, 1)
        om0m = omega[mm - 1]
        delm1 = 1.0 / (om0p - om0m)
        for k in range(1, nang + 1):
            k2 = k
            df2kp = f2[:, k - 1, mp - 1] * delm1
            df2km = f2[:, k - 1, mm - 1] * delm1
            psum = np.zeros(npts)
            for m1 in range(1, nfre + 1):
                om1 = omega[m1 - 1]
                m2_m = im_m[m1 - 1, m - 1]
                m2_p = im_p[m1 - 1, m - 1]
                for k1 in range(1, nang + 1):
                    l = ll[k1 - 1, k - 1]
                    xincr = np.zeros(npts)
                    for ij in range(npts):
                        d = jd[ij] - 1
                        if abs(om1) < om0h:
                            psum[ij] += ta[d, l - 1, m1 - 1, m - 1] * (
                                f2[ij, k1 - 1, m1 - 1] * f2[ij, k2 - 1, m2_m - 1]
                                + f2[ij, k2 - 1, m1 - 1] * f2[ij, k1 - 1, m2_m - 1])
                        xincr[ij] = (2.0 * tb[d, l - 1, m1 - 1, m - 1]
                                     * f2[ij, k2 - 1, m2_p - 1])
                        xincr[ij] += (tc_ql[d, l - 1, m1 - 1, m - 1]
                                      * f2[ij, k - 1, m - 1])
                        xincr[ij] -= (df2kp[ij] * tt_4p[d, l - 1, m1 - 1, m - 1]
                                      - df2km[ij] * tt_4m[d, l - 1, m1 - 1, m - 1])
                        psum[ij] += f2[ij, k1 - 1, m1 - 1] * xincr[ij]
            f3[:, k - 1, m - 1] = psum
    return f3


def cal_second_order_spec(f1, depth, emean, akmean, fr, th, fratio, nang,
                          nfre, so_tables, sig):
    """cal_second_order_spec.F90:93-190 (interpolating branch, MR=MA=2).

    f1: (npts, nang, nfre) modified in place per the Fortran; returns copy.
    so_tables: dict from build_oracle_tables.
    """
    st = so_tables
    nfreh, nangh = st["nfreh"], st["nangh"]
    mr, ma = st["mr"], st["ma"]
    npts = f1.shape[0]
    f1 = f1.copy()

    gam_b_j = 0.6
    zfac = gam_b_j**2 / 16.0

    pf1 = np.zeros((npts, nangh, nfreh))
    for m in range(1, nfreh + 1):
        m0 = mr * m
        for k in range(1, nangh + 1):
            k0 = ma * k + 1
            if k0 > nang:
                k0 -= nang
            if k0 < 1:
                k0 += nang
            pf1[:, k - 1, m - 1] += f1[:, k0 - 1, m0 - 1]

    pf3 = secspom(pf1, nfreh, nangh, st["nmax"], st["deptha"], st["depthd"],
                  st["ndepth"], st["omstart"], st["frac"], mr, st["dfdth"],
                  st["omega"], depth, akmean, st["ta"], st["tb"],
                  st["tc_ql"], st["tt_4m"], st["tt_4p"], st["im_p"],
                  st["im_m"])

    emaxl = np.where(emean <= zfac * depth**2, 1.0, 0.0)

    for m in range(1, nfre + 1):
        xm = float(m // mr)
        m0 = int(xm)
        if m0 < 1:
            m0, mp, d1 = 1, 2, 1.0
        elif m0 < nfreh:
            mp = m0 + 1
            d1 = (fr[m - 1] - fr[mr * m0 - 1]) / (fr[mr * mp - 1] - fr[mr * m0 - 1])
        else:
            m0 = mp = nfreh
            d1 = 0.0
        d2 = 1.0 - d1
        for k in range(1, nang + 1):
            xk = float((k - 1) // ma)
            k0 = int(xk)
            d3 = (k - 1) / ma - xk
            d4 = 1.0 - d3
            if k0 < 1:
                k0 += nangh
            kp = k0 + 1
            if kp > nangh:
                kp -= nangh
            for ij in range(npts):
                c1 = pf3[ij, k0 - 1, m0 - 1] * d4 + pf3[ij, kp - 1, m0 - 1] * d3
                c2 = pf3[ij, kp - 1, mp - 1] * d3 + pf3[ij, k0 - 1, mp - 1] * d4
                delf = c1 * d2 + c2 * d1
                f1[ij, k - 1, m - 1] = max(
                    min(1e-6, f1[ij, k - 1, m - 1]),
                    f1[ij, k - 1, m - 1] + emaxl[ij] * sig * delf)
    return f1


def build_oracle_tables(fr, th, nang, nfre, fratio, ndepth, deptha, depthd,
                        aki_fn=aki_scalar):
    """secondhh_gen.F90:70-125 scalar transcription → dict."""
    nfreh = nfre // 2
    nangh = nang // 2
    frac = fratio - 1.0
    omstart = ZPI * fr[0]
    mr = nfre // nfreh
    xmr = 1.0 / mr
    ma = nang // nangh
    delth = ZPI / nang
    delthh = ma * delth

    omega = np.zeros(nfreh)
    for m in range(1, nfreh + 1):
        omega[m - 1] = ZPI * fr[mr * m - 1]
    thh = np.zeros(nangh)
    for k in range(1, nangh + 1):
        k0 = ma * k + 1
        if k0 > nang:
            k0 -= nang
        thh[k - 1] = th[k0 - 1]

    co1 = 0.5 * delthh / ZPI
    dfdth = np.zeros(nfreh)
    dfdth[0] = co1 * (omega[1] - omega[0])
    for m in range(2, nfreh):
        dfdth[m - 1] = co1 * (omega[m] - omega[m - 2])
    dfdth[nfreh - 1] = co1 * (omega[nfreh - 1] - omega[nfreh - 2])

    nmax = int(1 + xmr * (1 + nint(
        math.log(2.0 * omega[nfreh - 1] / omstart) / math.log(1.0 + frac))))

    ta, tb, tc_ql, tt_4m, tt_4p, im_p, im_m, tfak = tables_2nd(
        nfreh, nangh, ndepth, omstart, frac, xmr, dfdth, omega, thh,
        deptha, depthd, aki_fn=aki_fn)
    return dict(nfreh=nfreh, nangh=nangh, mr=mr, ma=ma, nmax=nmax,
                frac=frac, omstart=omstart, omega=omega, thh=thh,
                dfdth=dfdth, ta=ta, tb=tb, tc_ql=tc_ql, tt_4m=tt_4m,
                tt_4p=tt_4p, im_p=im_p, im_m=im_m, tfak=tfak,
                ndepth=ndepth, deptha=deptha, depthd=depthd)
