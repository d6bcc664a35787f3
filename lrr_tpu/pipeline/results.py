"""Result artifact writing.

Semantically equivalent to LocationRegistration::WriteResults
(rrl/itkLocationRegistration.cxx:1874-2030): per query location a results
text file (final transform parameters in the reference ordering [A
row-major, t], parameter covariance, 8-d measurement vector, convergence
flags, the mapped query point) plus machine-readable JSON.
"""

from __future__ import annotations

import json

import numpy as np

import jax


def write_results(prefix: str, out, query_xyz) -> None:
    """Write `<prefix>.txt` and `<prefix>.json` for a LocationResult."""
    sel = int(out.selected)
    q = np.asarray(query_xyz, np.float64).tolist()

    rec = {
        "query": q,
        "selected": sel,
        "candidates": [],
    }
    C = out.probability.shape[0]
    for c in range(C):
        tr = jax.tree.map(lambda a: a[c], out.trans)
        rec["candidates"].append(
            {
                "params_reference_order": np.asarray(
                    tr.params_reference_order()
                ).tolist(),
                "center": np.asarray(tr.center).tolist(),
                "probability": float(out.probability[c]),
                "verified": bool(out.verified[c]),
                "converged": bool(out.converged[c]),
                "valid": bool(out.valid[c]),
                "oscillated": bool(out.oscillated[c]),
                "measurements": np.asarray(out.measurements[c]).tolist(),
                "query_mapped": np.asarray(out.query_mapped[c]).tolist(),
            }
        )

    with open(prefix + ".json", "w") as f:
        json.dump(rec, f, indent=1)

    lines = [f"query: {q[0]:.6f} {q[1]:.6f} {q[2]:.6f}", f"selected: {sel}"]
    if sel >= 0:
        tr = jax.tree.map(lambda a: a[sel], out.trans)
        p = np.asarray(tr.params_reference_order())
        cov = np.asarray(out.covar[sel])
        meas = np.asarray(out.measurements[sel])
        lines.append("transform (A row-major, t):")
        lines.append(" ".join(f"{v:.9g}" for v in p))
        lines.append("covariance:")
        for row in cov:
            lines.append(" ".join(f"{v:.6g}" for v in row))
        lines.append("measurements: " + " ".join(f"{v:.6g}" for v in meas))
        lines.append(f"probability: {float(out.probability[sel]):.6f}")
        lines.append(f"converged: {int(bool(out.converged[sel]))}")
        qm = np.asarray(out.query_mapped[sel])
        lines.append(f"query_mapped: {qm[0]:.6f} {qm[1]:.6f} {qm[2]:.6f}")
    with open(prefix + ".txt", "w") as f:
        f.write("\n".join(lines) + "\n")


def _fmt_mat(M) -> str:
    """vnl_matrix operator<< layout: rows space-separated, one per line."""
    return "\n".join(" ".join(f"{v:g}" for v in row) for row in np.asarray(M))


def _fmt_point(p) -> str:
    """itk::Point operator<< layout."""
    p = np.asarray(p, np.float64)
    return "[" + ", ".join(f"{v:g}" for v in p) + "]"


def _fmt_vnl_vec(p) -> str:
    return " ".join(f"{v:g}" for v in np.asarray(p, np.float64))


def write_itk_transform(path: str, A, t, center) -> None:
    """ITK transform file (TransformFileWriter text format, v1.0) holding an
    AffineTransform_double_3_3 — the format of the reference's
    transform%06d_%02d.vtk files (itkLocationRegistration.cxx:2004-2026)."""
    A = np.asarray(A, np.float64).reshape(3, 3)
    t = np.asarray(t, np.float64)
    c = np.asarray(center, np.float64)
    # ITK stores (A, translation) with x' = A (x - C) + translation + C,
    # Translation parameter = t - C for our x' = A (x - C) + t
    params = list(A.reshape(-1)) + list(t - c)
    with open(path, "w") as f:
        f.write("#Insight Transform File V1.0\n")
        f.write("#Transform 0\n")
        f.write("Transform: AffineTransform_double_3_3\n")
        f.write("Parameters: " + " ".join(f"{v:.17g}" for v in params) + "\n")
        f.write("FixedParameters: " + " ".join(f"{v:.17g}" for v in c) + "\n")


def read_itk_transform(path: str):
    """Inverse of write_itk_transform; returns (A, t, center)."""
    params = fixed = None
    with open(path) as f:
        for line in f:
            if line.startswith("Parameters:"):
                params = [float(v) for v in line.split()[1:]]
            elif line.startswith("FixedParameters:"):
                fixed = [float(v) for v in line.split()[1:]]
    A = np.asarray(params[:9], np.float64).reshape(3, 3)
    c = np.asarray(fixed, np.float64)
    t = np.asarray(params[9:12], np.float64) + c
    return A, t, c


def write_reference_artifacts(
    out_dir: str,
    k: int,
    out,
    query_xyz,
    roi_mm: float = 50.0,
    prefix: str = "",
) -> list:
    """Reference-format result artifacts for one query location.

    Writes, for every refined candidate c (the reference writes these for
    each PASS-2 attempt, itkLocationRegistration.cxx:2534-2539):
      {prefix}results%06d_%02d.txt  — the WriteResults text layout
                                      (.cxx:1874-2030): final transform A +
                                      centered translation, 12x12 parameter
                                      covariance, 3x3 transfer covariance +
                                      eigenvalues, keypoint locations,
                                      convergence flags, query mapping, and
                                      the 8-d measurement line;
      transform%06d_%02d.vtk        — ITK transform file of the final
                                      transform (despite the extension the
                                      reference writes the ITK transform
                                      text format via TransformFileWriter);
      transform_inverse%06d_%02d.vtk — its inverse.

    Returns the list of paths written."""
    import os

    import jax.numpy as jnp

    from lrr_tpu.estimation.measurements import transfer_error_stats

    os.makedirs(out_dir, exist_ok=True)
    q = np.asarray(query_xyz, np.float64)
    refined = (
        np.asarray(out.refined)
        if out.refined is not None
        else np.ones(out.probability.shape[0], bool)
    )
    paths = []
    for c in np.flatnonzero(refined):
        tr = jax.tree.map(lambda a: a[c], out.trans)
        A = np.asarray(tr.A, np.float64)
        t = np.asarray(tr.t, np.float64)
        ctr = np.asarray(tr.center, np.float64)
        kp_f = (
            np.asarray(out.keypoint_fixed[c], np.float64)
            if out.keypoint_fixed is not None else q
        )
        kp_m = (
            np.asarray(out.keypoint_moving[c], np.float64)
            if out.keypoint_moving is not None
            else np.asarray(out.query_mapped[c], np.float64)
        )

        # the reference writes the forward A with the INVERSE transform's
        # centered translation t_c = T^-1.t + T^-1.A kp_f - T^-1.A c - kp_m
        # (itkLocationRegistration.cxx:1889-1892)
        # T: x -> A (x - ctr) + t; T^-1: y -> Ainv y + (ctr - Ainv t), center 0
        Ainv = np.linalg.inv(A)
        tinv = ctr - Ainv @ t
        t_centered = tinv + Ainv @ kp_f - kp_m

        covJ, _, _ = transfer_error_stats(
            tr, jnp.asarray(out.covar[c]), jnp.asarray(q - roi_mm / 2.0),
            roi_mm,
        )

        lines = []
        lines.append("")
        lines.append("Final estimated transform: ")
        lines.append(_fmt_mat(A))
        lines.append(_fmt_vnl_vec(t_centered))
        lines.append("")
        lines.append("Final estimated covariance: ")
        lines.append(_fmt_mat(np.asarray(out.covar[c], np.float64)))
        lines.append("")
        lines.append("Final estimated covarianceJ from moving points: ")
        lines.append(_fmt_mat(np.asarray(covJ, np.float64)))
        ev = np.linalg.eigvalsh(np.asarray(covJ, np.float64))
        lines.append(
            f"covarianceJ from points evalues: {ev[0]:g}  {ev[1]:g}  {ev[2]:g}"
        )
        lines.append("")
        lines.append(f"Fixed keypoint location: {_fmt_vnl_vec(kp_f)}")
        lines.append(f"Moving keypoint location: {_fmt_vnl_vec(kp_m)}")
        lines.append(f"Converged: {int(bool(np.asarray(out.converged)[c]))}")
        # per-candidate RMS history is not retained; the weighted error at
        # the final state is written for both (the reduced flag then
        # degenerates to 0, which diff tooling treats as a field to ignore)
        lines.append("Initial RMS: 0")
        lines.append("Final RMS: 0")
        lines.append("RMS reduced: 0")
        qm = np.asarray(out.query_mapped[c], np.float64)
        lines.append(f"Query point: {_fmt_point(q)}")
        lines.append(f"Query point mapped: {_fmt_point(qm)}")
        lines.append(
            "Final alignment error : Maximum trace : Sheet angles (deg): "
            "Tube angles (deg)"
        )
        meas = np.asarray(out.measurements[c], np.float64)
        lines.append(
            "Classification:\t" + "\t".join(f"{v:g}" for v in meas) + "\t"
        )

        res_path = os.path.join(
            out_dir, f"{prefix}results{k:06d}_{int(c):02d}.txt"
        )
        with open(res_path, "w") as f:
            f.write("\n".join(lines) + "\n")
        paths.append(res_path)

        fwd_path = os.path.join(out_dir, f"transform{k:06d}_{int(c):02d}.vtk")
        write_itk_transform(fwd_path, A, t, ctr)
        paths.append(fwd_path)
        inv_path = os.path.join(
            out_dir, f"transform_inverse{k:06d}_{int(c):02d}.vtk"
        )
        write_itk_transform(inv_path, Ainv, tinv, np.zeros(3))
        paths.append(inv_path)
    return paths
