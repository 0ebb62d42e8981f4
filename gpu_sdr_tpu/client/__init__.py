"""Client/analysis layer — the pyUSRP-equivalent surface.

Mirrors the reference Python client library module-for-module:

  files        <- pyUSRP/USRP_files.py       (HDF5 schema, parameter mirror)
  connections  <- pyUSRP/USRP_connections.py (TCP client runtime)
  vna          <- pyUSRP/USRP_VNA.py         (S21 sweeps + analysis)
  noise        <- pyUSRP/USRP_noise.py       (multi-tone noise + PSD)
  fitting      <- pyUSRP/USRP_fitting.py     (resonator fits)
  delay        <- pyUSRP/USRP_delay.py       (line-delay calibration)
  full_spec    <- pyUSRP/USRP_full_spec.py   (full-PFB spectrogram)
  triggers     <- pyUSRP/USRP_triggers.py    (client-side triggers)
  plotting     <- pyUSRP/USRP_plotting.py    (raw-data plots)
  data_analysis<- pyUSRP/USRP_data_analysis.py

The HDF5 layout is byte-compatible with the reference (groups raw_dataN/<ant>
with parameter attrs + resizable complex64 'data', VNA_N, NoiseN,
Resonators, delay_info), so existing analysis workflows port directly.
"""
