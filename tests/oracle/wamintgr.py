"""Straight-line f64 transcription of the WAMINTGR stepping loop.

Composes the existing per-kernel oracles into a multi-step trajectory —
the seams the per-kernel tests cannot see:

  * PROPAGS2 applied through the gather stencil (propags2.F90:106-160,
    refraction-branch form: all weight slots, downstream slots are zero
    without currents)
  * PROPAG_WAM band structure: fast-wave sub-stepping of the m<MLF band
    with DELPRO/2 weights, the m>=MLF band once (propag_wam.F90:247-313)
  * the physics cadence (physics when the accumulated advection time
    reaches IDELT, wamintgr.F90:117-146)
  * NEWWIND forcing swap with the weak-wind TAUW cap
    (newwind.F90:97-146) and the WAMWND U10 floor (wamwnd.F90 CASE(3))

All loops are deliberately naive transcriptions; no JAX."""

import numpy as np

from oracle import ctuw as octuw
from oracle import implschfull as oimpl


def propags2(f_ext, w, st, kcr, nfre_red):
    """One stencil application (propags2.F90:106-160).

    ``f_ext`` (nang, nfre_red, npts+1) with the land slot trailing;
    ``w`` the oracle ctuw dict (npts-major).  Returns (nang, nfre_red,
    npts)."""
    nang = f_ext.shape[0]
    npts = f_ext.shape[2] - 1
    out = np.zeros((nang, nfre_red, npts))
    for k in range(nang):
        km1 = (k - 1) % nang
        kp1 = (k + 1) % nang
        for m in range(nfre_red):
            mm1 = max(0, m - 1)
            mp1 = min(nfre_red - 1, m + 1)
            for ij in range(npts):
                v = (1.0 - w["sumwn"][ij, k, m]) * f_ext[k, m, ij]
                for ic in range(2):
                    v += (w["wlonn"][ij, k, m, ic]
                          * f_ext[k, m, st.klon[ij, ic]])
                    for icl in range(2):
                        v += (w["wlatn"][ij, k, m, ic, icl]
                              * f_ext[k, m, st.klat[ij, ic, icl]])
                for icr in range(4):
                    pc = kcr[k, icr] - 1
                    for icl in range(2):
                        v += (w["wcorn"][ij, k, m, icr, icl]
                              * f_ext[k, m, st.kcor[ij, pc, icl]])
                v += w["wkpmn"][ij, k, m, 0] * f_ext[km1, m, ij]
                v += w["wkpmn"][ij, k, m, 2] * f_ext[kp1, m, ij]
                if w.get("wmpmn") is not None:
                    v += w["wmpmn"][ij, k, m, 0] * f_ext[k, mm1, ij]
                    v += w["wmpmn"][ij, k, m, 2] * f_ext[k, mp1, ij]
                out[k, m, ij] = v
    return out


def with_land(f):
    return np.concatenate([f, np.zeros(f.shape[:-1] + (1,))], axis=-1)


WSPMIN_RESET_TAUW = 4.0
ACD, BCD = 8.0e-4, 8.0e-5


def run(*, nsteps, idelpro, idelt, delpro_lf, ifrelfmax, irefra,
        fl1, stress, forcing_at, wind_every,
        st, tb, otb, params, env, refr, curmask,
        circ, r_earth, swellft, x0tauhf, wtauhf):
    """The WAMINTGR loop.  ``forcing_at(step)`` returns raw f64 forcing
    dicts (wswave/wdwave/aird/wstar/cicover) over the real points;
    ``env`` the f64 depth-property dict with *_ext (nfre, npts+1) and
    per-point fields; ``refr`` dict(thdd, thdc, sdot) or empty;
    ``curmask`` per-point CFL current mask or None.  Returns the final
    (fl1, stress) over the real points."""
    nfre_red = tb.nfre_red
    nang = tb.nang
    _, _, kcr = octuw.dir_selectors(nang, tb.costh, tb.sinth)

    def weights(dt):
        return octuw.ctuw(
            dt, tb, st, env["cgroup_ext"][:nfre_red],
            env["omosnh2kd_ext"][:nfre_red],
            np.asarray(st.cosphm1_pt, np.float64),
            env["ucur_ext"], env["vcur_ext"], irefra=irefra,
            thdd=refr.get("thdd"), thdc=refr.get("thdc"),
            sdot=refr.get("sdot"), curmask=curmask,
            circ=circ, r_earth=r_earth)

    w_full = weights(idelpro)
    w_lf = weights(delpro_lf) if ifrelfmax > 0 else None
    nsub = max(1, round(idelpro / delpro_lf)) if ifrelfmax > 0 else 1

    def band(w, m0, m1):
        return {k: (v[:, :, m0:m1] if getattr(v, "ndim", 0) >= 3 else v)
                for k, v in w.items() if v is not None}

    def advect(f):
        """propag_wam.F90:240-330 band structure.  With σ̇ shifting the
        sub-band window carries one extra read-only frequency so the
        band-edge m+1 coupling sees the once-advected high band
        (ND3EF1 = IFRELFMAX+1, propag_wam.F90:262-265)."""
        if ifrelfmax > 0:
            mw = ifrelfmax + 1 if irefra in (2, 3) else ifrelfmax
            hf = propags2(with_land(f[:, ifrelfmax:nfre_red]),
                          band(w_full, ifrelfmax, nfre_red), st, kcr,
                          nfre_red - ifrelfmax)
            wb = band(w_lf, 0, mw)
            lf_win = f[:, :mw]
            for _ in range(nsub):
                lf = propags2(with_land(lf_win), wb, st, kcr,
                              mw)[:, :ifrelfmax]
                lf_win = (np.concatenate([lf, hf[:, :1]], axis=1)
                          if mw > ifrelfmax else lf)
            out = np.concatenate([lf, hf], axis=1)
        else:
            out = propags2(with_land(f[:, :nfre_red]), w_full, st, kcr,
                           nfre_red)
        if nfre_red < f.shape[1]:
            out = np.concatenate([out, f[:, nfre_red:]], axis=1)
        return out

    def floor_u10(raw):
        out = dict(raw)
        out["wswave"] = np.maximum(raw["wswave"], 1.0)
        return out

    frc = floor_u10(forcing_at(0))
    phys_elapsed = 0.0
    for i in range(nsteps):
        if wind_every and i > 0 and i % wind_every == 0:
            frc = floor_u10(forcing_at(i))
            u10 = frc["wswave"]
            tlwmax = (1.0 / WSPMIN_RESET_TAUW) * (ACD + BCD * u10) * u10**3
            stress = dict(stress, tauw=np.where(
                u10 < WSPMIN_RESET_TAUW,
                np.minimum(stress["tauw"], tlwmax), stress["tauw"]))
        fl1 = advect(fl1)
        phys_elapsed += idelpro
        if phys_elapsed >= idelt - 1e-6:
            phys_elapsed = 0.0
            fl1_pm = fl1.transpose(2, 0, 1)      # oracle is npts-major
            fl1_pm, state = oimpl.implsch(
                fl1_pm, env["wavnum"], env["cgroup"], env["xk2cg"],
                env["cinv"], env["stokfac"], env["depth"],
                env["emaxdpt"],
                frc["wswave"], frc["wdwave"], frc["aird"], frc["wstar"],
                frc["cicover"],
                stress["ufric"], stress["tauw"], stress["tauwdir"],
                stress["z0m"], stress["z0b"], stress["chrnck"],
                otb, params, idelt=idelt, swellft=swellft,
                x0tauhf=x0tauhf, wtauhf=wtauhf, nfre_red=nfre_red,
                alphapmax=params.alphapmax)
            fl1 = fl1_pm.transpose(1, 2, 0)
            stress = {k: state[k] for k in (
                "ufric", "tauw", "tauwdir", "z0m", "z0b", "chrnck")}
    return fl1, stress
