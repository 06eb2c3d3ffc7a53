"""Sources — the harvest/loading layer (ref: minerva/harvest/*,
minerva/loading/* [U]): format plugins, CSV parser config, and the
normalize-to-trend-package pipeline, re-expressed as DataFrame
transformations."""
