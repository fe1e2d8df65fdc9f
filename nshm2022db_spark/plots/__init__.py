"""Plot sinks (S10)."""

from nshm2022db_spark.plots.rupture import plot_region, plot_rupture

__all__ = ["plot_region", "plot_rupture"]
