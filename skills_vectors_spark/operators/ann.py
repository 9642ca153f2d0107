"""(stub — filled in during build)"""
