// empty stub: boost is not installed; this include in the reference's System.cc is vestigial
