package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.graftbridge.Bridge

package object functions {

  /** Integral division on longs (`a div b`). Plain `/` on Columns is
   * double division, which corrupts epoch-nanosecond arithmetic —
   * doubles carry 53 mantissa bits, epoch-ns values need 61. */
  def ldiv(a: Column, b: Column): Column =
    Bridge.column(IntegralDivide(Bridge.expression(a), Bridge.expression(b)))

  def ldiv(a: Column, b: Long): Column =
    ldiv(a, org.apache.spark.sql.functions.lit(b))
}
