"""(stub — queries register here in a later milestone)"""
