"""Data calibration tasks.

Re-provides reference ``draco/analysis/calibration.py`` (ApplyGain:12):
apply per-input complex gains (or their inverse) to visibility products via
the vectorised gather kernel in :func:`draco_tpu.ops.tools.apply_gain`.
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import median_filter

from ..core import config, containers
from ..core.task import ContainerTask
from ..ops import tools


class ApplyGain(ContainerTask):
    """Apply a set of gains to a timestream or sidereal stack.

    (reference calibration.py:12-195)

    Attributes
    ----------
    inverse : bool
        Apply the inverse of the gains (calibration) rather than the gains.
    update_weight : bool
        Scale the weight dataset consistently.
    smoothing_length : float
        Median-smooth gains over this many seconds (time streams only).
    """

    inverse = config.bool_prop(True)
    update_weight = config.bool_prop(False)
    smoothing_length = config.float_prop(None)

    def process(self, tstream, gain):
        tstream.redistribute("freq")
        gain.redistribute("freq")

        common = isinstance(
            gain,
            (containers.CommonModeGainData, containers.CommonModeSiderealGainData),
        )
        if tstream.is_stacked and not common:
            raise ValueError(
                f"Per-input gains cannot be pushed onto stacked data ({tstream!s})"
            )

        if isinstance(gain, containers.StaticGainData):
            gain_arr = np.asarray(gain.gain[:])[..., np.newaxis]
            weight_arr = (
                np.asarray(gain.weight[:])[..., np.newaxis]
                if gain.weight is not None
                else None
            )
        elif isinstance(
            gain,
            (
                containers.GainData,
                containers.SiderealGainData,
                containers.CommonModeGainData,
                containers.CommonModeSiderealGainData,
            ),
        ):
            gain_arr = np.nan_to_num(np.asarray(gain.gain[:]))
            weight_arr = (
                np.asarray(gain.weight[:]) if gain.weight is not None else None
            )
            if isinstance(
                gain,
                (containers.SiderealGainData, containers.CommonModeSiderealGainData),
            ):
                if (gain.ra != tstream.ra).any():
                    raise RuntimeError(
                        "Gain data and sidereal stream defined at different "
                        "RA samples."
                    )
            else:
                if (gain.time != tstream.time).any():
                    raise RuntimeError(
                        "Gain data and timestream defined at different time "
                        "samples."
                    )
                if self.smoothing_length is not None:
                    gain_arr, weight_arr = self._smooth(gain_arr, weight_arr, gain)
        else:
            raise RuntimeError("Unrecognised gain container layout.")

        gain_arr = np.nan_to_num(gain_arr)
        inverse_gain_arr = tools.invert_no_zero(gain_arr)

        self.log.info(
            "Applying inverse gain." if self.inverse else "Applying gain."
        )
        gvis = inverse_gain_arr if self.inverse else gain_arr
        vis = np.asarray(tstream.vis[:])
        if common:
            vis = vis * np.abs(gvis[:, np.newaxis, :]) ** 2
        else:
            vis = np.asarray(
                tools.apply_gain(vis, gvis, prod_map=tstream.prod)
            )
        tstream.vis[:] = vis.astype(tstream.vis.dtype)

        if self.update_weight:
            self.log.info("Applying gain to weight.")
            gweight = np.abs(gain_arr if self.inverse else inverse_gain_arr) ** 2
        else:
            gweight = np.ones_like(gain_arr, dtype=np.float64)
        if weight_arr is not None:
            gweight = gweight * (weight_arr > 0.0).astype(np.float64)

        w = np.asarray(tstream.weight[:])
        if common:
            w = w * gweight[:, np.newaxis, :] ** 2
        else:
            w = np.asarray(
                tools.apply_gain(w, gweight, prod_map=tstream.prod)
            ).real
        tstream.weight[:] = w.astype(tstream.weight.dtype)

        convert_units_to = gain.gain.attrs.get("convert_units_to")
        if convert_units_to is not None:
            tstream.vis.attrs["units"] = convert_units_to
        return tstream

    def _smooth(self, gain_arr, weight_arr, gain):
        """WEIGHTED median smoothing of amplitude/phase over time.

        (reference :102-139, caput median.moving_weighted_median):
        flagged samples (weight 0, gains nan_to_num'd to 0) carry zero
        weight so they cannot drag good neighbours' smoothed gain to
        zero — an unweighted median zeroes any sample whose window is
        >= 50% flagged, and ApplyGain then silently zeroes the
        calibrated visibilities there.
        """
        from ..ops.median import moving_weighted_median

        tdiff = gain.time[1] - gain.time[0]
        samp = int(np.ceil(self.smoothing_length / tdiff))
        size = 2 * (samp // 2) + 1
        shp = gain_arr.shape
        gain_r = gain_arr.reshape(-1, shp[-1])
        if weight_arr is not None:
            wmed = (weight_arr.reshape(-1, shp[-1]) > 0).astype(np.float64)
        else:
            wmed = np.ones_like(gain_r, dtype=np.float64)
        smooth_amp = np.asarray(
            moving_weighted_median(np.abs(gain_r), wmed, (1, size))
        )
        smooth_phase = np.asarray(
            moving_weighted_median(np.angle(gain_r), wmed, (1, size))
        )
        gain_arr = (smooth_amp * np.exp(1.0j * smooth_phase)).reshape(shp)
        if weight_arr is not None:
            wshp = weight_arr.shape
            weight_arr = np.asarray(
                moving_weighted_median(
                    weight_arr.reshape(-1, wshp[-1]), wmed, (1, size)
                )
            ).reshape(wshp)
            weight_arr[wmed.reshape(wshp) == 0] = 0.0
        return gain_arr, weight_arr
