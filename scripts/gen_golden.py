#!/usr/bin/env python3
"""Regenerates src/test/resources/indicator_golden.csv: a 120-row OHLCV
fixture with all 13 indicator columns computed via pandas rolling/ewm
kernels — the independent implementation GoldenSpec compares against
(FIXTURES.md §5). Deterministic (seed 7)."""
import pandas as pd, numpy as np
np.random.seed(7)
n = 120
ts = pd.date_range("2024-03-01", periods=n, freq="1h", tz="UTC")
close = np.round(100 + np.cumsum(np.random.normal(0, 1.5, n)), 2)
high = np.round(close + np.abs(np.random.normal(0.5, 0.4, n)), 2)
low = np.round(close - np.abs(np.random.normal(0.5, 0.4, n)), 2)
openp = np.round((high + low) / 2, 2)
vol = (np.arange(n) % 37 + 5).astype(np.int64)
df = pd.DataFrame({"time": ts, "symbol": "G", "open": openp, "high": high,
                   "low": low, "close": close, "volume": vol})
c = pd.Series(close); h = pd.Series(high); l = pd.Series(low); v = pd.Series(vol, dtype=float)

sma20 = c.rolling(20).mean()
sd20 = c.rolling(20).std(ddof=1)
bb_u, bb_l = sma20 + 2 * sd20, sma20 - 2 * sd20
lo14, hi14 = l.rolling(14).min(), h.rolling(14).max()
rawk = 100 * (c - lo14) / (hi14 - lo14)
stoch = rawk.rolling(3).mean()
tp = (h + l + c) / 3
tpd = tp.diff()
posmf = np.where(tpd > 0, tp * v, 0.0); negmf = np.where(tpd < 0, tp * v, 0.0)
posmf[0] = np.nan; negmf[0] = np.nan
pos14 = pd.Series(posmf).rolling(14).sum(); neg14 = pd.Series(negmf).rolling(14).sum()
mfi = 100 * pos14 / (pos14 + neg14)
sign = np.sign(c.diff().fillna(1.0))  # first row seeds +volume
obv = (sign * v).cumsum().astype(np.int64)
day = pd.Series(ts).dt.floor("D")
vnum = (tp * v).groupby(day).cumsum(); vden = v.groupby(day).cumsum()
vwap = vnum / vden

def seeded_ema(x, n_, alpha):
    s = x.copy().astype(float)
    s.iloc[: n_ - 1] = np.nan
    s.iloc[n_ - 1] = x.iloc[:n_].mean()
    # min_periods=1: ewm skips leading NaNs; min_periods=n_ would demand
    # n_ NON-NaN inputs and delay the seed
    return s.ewm(alpha=alpha, adjust=False, min_periods=1).mean()

ema10 = seeded_ema(c, 10, 2/11); ema20 = seeded_ema(c, 20, 2/21)
macd = seeded_ema(c, 12, 2/13) - seeded_ema(c, 26, 2/27)

d = c.diff()
gain = d.clip(lower=0); loss = (-d).clip(lower=0)
def seeded_rma_from(x, start, n_):
    vals = x.iloc[start:].reset_index(drop=True)
    out = pd.Series(np.nan, index=range(len(x)))
    s = np.nan; acc = 0.0
    for i, xv in enumerate(vals):
        if i < n_ - 1: acc += xv
        elif i == n_ - 1: s = (acc + xv) / n_
        else: s = (1/n_) * xv + (1 - 1/n_) * s
        if i >= n_ - 1: out.iloc[start + i] = s
    return out
ag = seeded_rma_from(gain, 1, 14); al = seeded_rma_from(loss, 1, 14)
rsi = np.where(al == 0, 100.0, 100 - 100 / (1 + ag / al))
rsi = pd.Series(rsi).where(ag.notna())

pc = c.shift(1)
tr = pd.concat([h - l, (h - pc).abs(), (l - pc).abs()], axis=1).max(axis=1)
tr.iloc[0] = h.iloc[0] - l.iloc[0]
atr = seeded_rma_from(tr, 0, 14)

out = df.copy()
for name, series in [("sma_20", sma20), ("ema_10", ema10), ("ema_20", ema20),
                     ("macd_line", macd), ("rsi_14", rsi), ("stoch_k_14", stoch),
                     ("mfi_14", mfi), ("bb_upper", bb_u), ("bb_lower", bb_l),
                     ("atr_14", atr), ("vwap", vwap)]:
    out[name] = np.asarray(series)
out["obv"] = obv
out["time"] = out["time"].dt.strftime("%Y-%m-%d %H:%M:%S")
out.to_csv("src/test/resources/indicator_golden.csv", index=False)
print("wrote", len(out), "rows")
