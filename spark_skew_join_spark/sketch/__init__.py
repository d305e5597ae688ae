from .cms import CountMinSketch, cms_from_dataframe
