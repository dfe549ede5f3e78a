"""MCBEF — Monte-Carlo Biphasic Estimation of Fire properties, re-expressed
as a deterministic Arrow-batched Spark stage over the detections table
(reference: src/MCBEF/MCBEF.py; lifecycle SURVEY.md §3.3).

Semantics mirrored from the reference:
- model selection: biphasic (smoldering + flaming) when FRP exceeds a
  threshold and the pixel is neither gas-flare nor static-anomaly, else
  uniphasic (MCBEF.py:616-697 gating);
- parameters (t_s, p_s, t_f, p_f) with bounds; forward model = Planck
  mixture x per-band atmospheric transmittance (MCBEF_MODEL_SCALAR.py:77-111
  simplified to band-centre wavelengths — the 201-sample RSR integration of
  MCBEF_MODEL_TENSOR.py is a documented deviation);
- background temperature MAP from the detection's M13 background radiance
  (MCBEF.py:433-456 reduced to its closed form under a flat prior);
- Metropolis sampling, 2 chains, tune + draw phases (namelist defaults
  scaled down: MCBEF/namelist.input:6-8), Gaussian proposals;
- posterior summaries per fire: mean, sd(ddof=1), mode, 95% HDI
  (MCBEF.py:827-913), plus FP_Power_T/F/S split by phase;
- failure-mode QA flags 100-104 style: 0 ok, 100 missing obs, 101 sampler
  degraded to uniphasic (MCBEF.py:97-107).

Determinism: the RNG is seeded per (doc_id, FP_Line, FP_Sample) via sha256,
so the distributed run reproduces the single-node oracle draw-for-draw —
SURVEY.md §4 requirement 5.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from filda_spark import kernels
from filda_spark.namelist import LAMBDA_UM

OBS_BANDS = ("M11", "M12", "M13")
# band-centre transmittance constants (reference carries per-λ tables in
# src/MCBEF/sensor/sensor_viirs/*.csv; FILDA_BT.py:27-35 carries these
# band-level values)
TRANSMITTANCE = {"M11": 0.95913553, "M12": 0.9465231, "M13": 0.9443206}

# --- sensor RSR: 201-sample spectral response per band -----------------------
# Mirrors the reference's RSR-integrated forward model
# (MCBEF_MODEL_TENSOR.py:43-259: planck x RSR x transmittance, trapezoid
# band integration, RSR-normalized). The λ grids / response shapes are
# deterministic synthetic stand-ins for the 9 sensor CSVs (201 λ-samples
# each, MCBEF_SENSOR.py:16-99) — no external data in this sandbox.
N_LAMBDA = 201


def _build_sensor() -> dict:
    out = {}
    for b in OBS_BANDS:
        lam0 = LAMBDA_UM[b]
        lam = np.linspace(lam0 * 0.95, lam0 * 1.05, N_LAMBDA)
        rsr = np.exp(-0.5 * ((lam - lam0) / (lam0 * 0.015)) ** 2)
        # transmittance dips away from band centre, anchored at the
        # band-level constant
        tau = TRANSMITTANCE[b] ** (1.0 + 0.5 * ((lam - lam0) / (lam0 * 0.05)) ** 2)
        out[b] = (lam, rsr, tau, np.trapz(rsr, lam))
    return out


SENSOR = _build_sensor()


def band_radiance(b: str, temp_k: float) -> float:
    """RSR-weighted band radiance: trapz(B(λ,T)·τ(λ)·RSR(λ)) / trapz(RSR)."""
    lam, rsr, tau, norm = SENSOR[b]
    return float(np.trapz(kernels.planck_rad(lam, temp_k) * tau * rsr, lam) / norm)


def sensor_rsr_frame() -> pd.DataFrame:
    """The sensor table in FIXTURES.md §2 shape (band, lambda, rsr,
    transmittance) for persistence alongside a corpus."""
    rows = []
    for b, (lam, rsr, tau, _n) in SENSOR.items():
        rows.append(pd.DataFrame(dict(band=b, lamda=lam, rsr=rsr, transmittance=tau)))
    return pd.concat(rows, ignore_index=True)

BOUNDS = dict(t_s=(400.0, 900.0), p_s=(1e-6, 0.2), t_f=(900.0, 2200.0), p_f=(1e-7, 0.05))
X0 = dict(t_s=600.0, p_s=1e-3, t_f=1400.0, p_f=1e-4)
N_CHAINS, N_TUNE, N_DRAWS = 2, 200, 300
FRP_BIPHASIC_THRESHOLD = 1.0  # MW


def _seed(doc_id: str, line: int, sample: int) -> int:
    h = hashlib.sha256(f"{doc_id}:{line}:{sample}".encode()).digest()
    return int.from_bytes(h[:8], "big")


def forward_rad(t_s, p_s, t_f, p_f, t_b):
    """Per-band TOA radiance of the biphasic mixture, RSR-integrated per
    band (trapezoid over the 201-λ response; MCBEF_MODEL_TENSOR semantics:
    the mixture is linear, so integrating each Planck term separately equals
    integrating the mixture)."""
    out = np.empty(len(OBS_BANDS))
    for i, b in enumerate(OBS_BANDS):
        lam, rsr, tau, norm = SENSOR[b]
        mix = (
            p_s * kernels.planck_rad(lam, t_s)
            + p_f * kernels.planck_rad(lam, t_f)
            + (1.0 - p_s - p_f) * kernels.planck_rad(lam, t_b)
        )
        out[i] = np.trapz(mix * tau * rsr, lam) / norm
    return out


def log_likelihood(params: np.ndarray, obs: np.ndarray, t_b: float, sigma: np.ndarray, biphasic: bool):
    t_s, p_s, t_f, p_f = params
    if not biphasic:
        t_f, p_f = t_s, 0.0
    model = forward_rad(t_s, p_s, t_f, p_f, t_b)
    r = (model - obs) / sigma
    return -0.5 * float(np.sum(r * r))


_PARAM_NAMES = ("t_s", "p_s", "t_f", "p_f")
_LO = np.array([BOUNDS[k][0] for k in _PARAM_NAMES])
_HI = np.array([BOUNDS[k][1] for k in _PARAM_NAMES])
_STEP = (_HI - _LO) * 0.02


def metropolis(obs: np.ndarray, t_b: float, seed: int, biphasic: bool):
    """Deterministic Metropolis: N_CHAINS x (N_TUNE tune + N_DRAWS draws),
    Gaussian proposals with per-100-step acceptance-rate step adaptation
    during tune only (reference: PyMC Metropolis tuning)."""
    sigma = np.maximum(np.abs(obs) * 0.05, 1e-4)
    draws = np.empty((N_CHAINS, N_DRAWS, 4))
    for c in range(N_CHAINS):
        rng = np.random.default_rng((seed + c) % (2**63))
        x = np.array([X0[k] for k in _PARAM_NAMES])
        step = _STEP.copy()
        ll = log_likelihood(x, obs, t_b, sigma, biphasic)
        n_acc = 0
        for it in range(N_TUNE + N_DRAWS):
            prop = np.clip(x + rng.normal(0.0, 1.0, 4) * step, _LO, _HI)
            ll_p = log_likelihood(prop, obs, t_b, sigma, biphasic)
            if np.log(rng.uniform()) < ll_p - ll:
                x, ll = prop, ll_p
                n_acc += 1
            if it < N_TUNE and (it + 1) % 100 == 0:
                rate = n_acc / (it + 1)
                step = step * (1.25 if rate > 0.35 else 0.8 if rate < 0.15 else 1.0)
            if it >= N_TUNE:
                draws[c, it - N_TUNE] = x
    return draws.reshape(-1, 4)


def hdi_95(x: np.ndarray):
    """Narrowest interval containing 95% of draws (MCBEF.py:827-913)."""
    s = np.sort(x)
    n = s.size
    k = max(int(np.floor(0.95 * n)), 1)
    widths = s[k - 1 :] - s[: n - k + 1]
    i = int(np.argmin(widths))
    return float(s[i]), float(s[i + k - 1])


def mode_of(x: np.ndarray):
    hist, edges = np.histogram(x, bins=40)
    i = int(np.argmax(hist))
    return float((edges[i] + edges[i + 1]) / 2.0)


STATE_FIELDS = ["doc_id", "FP_Line", "FP_Sample", "overpass", "QA"]
for _p in _PARAM_NAMES:
    STATE_FIELDS += [f"{_p}_mean", f"{_p}_sd", f"{_p}_mode", f"{_p}_low", f"{_p}_upp"]
STATE_FIELDS += ["FP_Power_S", "FP_Power_F", "FP_Power_T"]

STATE_SCHEMA = T.StructType(
    [
        T.StructField(c, T.StringType() if c in ("doc_id", "overpass") else T.IntegerType() if c in ("FP_Line", "FP_Sample", "QA") else T.DoubleType())
        for c in STATE_FIELDS
    ]
)

SIGMA_SB = kernels.SIGMA_SB


def estimate_one(row) -> dict:
    """Full MCBEF estimate for one detection row (pandas namedtuple)."""
    obs = np.array([getattr(row, f"FP_{b}_Rad") for b in OBS_BANDS], dtype=np.float64)
    out = dict(
        doc_id=row.doc_id,
        FP_Line=int(row.FP_Line),
        FP_Sample=int(row.FP_Sample),
        overpass=str(row.doc_id).rsplit(".", 1)[-1],
    )
    if not np.isfinite(obs).all():
        out["QA"] = 100
        for p in _PARAM_NAMES:
            for s in ("mean", "sd", "mode", "low", "upp"):
                out[f"{p}_{s}"] = float("nan")
        out["FP_Power_S"] = out["FP_Power_F"] = out["FP_Power_T"] = float("nan")
        return out
    t_b = float(kernels.bt_from_rad(max(row.FP_M13_Rad_Mean, 1e-6), LAMBDA_UM["M13"]))
    if not np.isfinite(t_b) or t_b < 200 or t_b > 340:
        t_b = 290.0
    biphasic = (
        np.isfinite(row.FP_Power)
        and row.FP_Power > FRP_BIPHASIC_THRESHOLD
        and getattr(row, "FP_Gas_Flaring", 0) != 1
    )
    qa = 0 if biphasic else 101
    seed = _seed(row.doc_id, int(row.FP_Line), int(row.FP_Sample))
    draws = metropolis(obs, t_b, seed, biphasic)
    for j, p in enumerate(_PARAM_NAMES):
        x = draws[:, j]
        lo, up = hdi_95(x)
        out[f"{p}_mean"] = float(x.mean())
        out[f"{p}_sd"] = float(x.std(ddof=1))
        out[f"{p}_mode"] = mode_of(x)
        out[f"{p}_low"] = lo
        out[f"{p}_upp"] = up
    area = float(getattr(row, "FP_Area_mod", 750.0 * 750.0))
    ps, ts = out["p_s_mean"], out["t_s_mean"]
    pf, tf = out["p_f_mean"], out["t_f_mean"]
    out["FP_Power_S"] = area * ps * SIGMA_SB * ts**4 * 1e-6
    out["FP_Power_F"] = (area * pf * SIGMA_SB * tf**4 * 1e-6) if biphasic else 0.0
    out["FP_Power_T"] = out["FP_Power_S"] + out["FP_Power_F"]
    out["QA"] = qa
    return out


def estimate_batches(pdfs):
    """mapInPandas kernel over (round-robin balanced) detection batches."""
    for pdf in pdfs:
        rows = [estimate_one(r) for r in pdf.itertuples()]
        yield pd.DataFrame(rows, columns=STATE_FIELDS)


def estimate(det: DataFrame, n_parts: int | None = None) -> DataFrame:
    """MCBEF State table from a detections DataFrame. The per-fire sampler
    cost is uniform, so a round-robin repartition balances perfectly
    (the reference fans out over a 70-core Pool, MCBEF.py:766-798)."""
    if n_parts:
        det = det.repartition(n_parts)
    return det.mapInPandas(estimate_batches, schema=STATE_SCHEMA)


def estimate_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """Single-node oracle twin: identical kernel over a pandas frame."""
    rows = [estimate_one(r) for r in pdf.itertuples()]
    return pd.DataFrame(rows, columns=STATE_FIELDS)
