"""ITSCP — intersection signal control problem on an N x N grid."""
