"""Host-side utilities: config, WAV IO, LUT loading, report writing."""
