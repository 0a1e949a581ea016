"""GEOS-free spatial layer (SURVEY.md §7.4.1).

The reference uses sf/GEOS for point-in-polygon joins, buffer-intersection
areas and CRS transforms (check_observed_habitat_type.Rmd:147-148,
calc_plot_segment_area.Rmd:48-113, process_external_data.Rmd:148-152). No
GIS library ships in this environment, so the kernels are implemented
directly in vectorized NumPy inside Arrow-batched pandas UDFs:

- ``geometry``  — ray-casting containment, circle/strip intersection areas
- ``crs``       — Lambert-72 (EPSG:31370) <-> WGS84, Snyder LCC-2SP formulas
- ``join``      — broadcast-polygon spatial join with bbox prefilter
"""
