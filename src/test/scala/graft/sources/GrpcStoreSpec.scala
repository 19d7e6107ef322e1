package graft.sources

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.sparkproject.connect.grpc.{CallOptions, ManagedChannelBuilder, StatusRuntimeException}
import org.sparkproject.connect.grpc.stub.ClientCalls

import graft.streaming.SpoolWriter

/** Real gRPC Carbon service over a real channel (wire-compatible with
  * the reference's grpc/carbon.proto service). */
class GrpcStoreSpec extends AnyFunSuite {

  test("Store/StoreSync over a real gRPC channel") {
    val dir = Files.createTempDirectory("graft-grpc").toString
    val spool = new SpoolWriter(s"$dir/spool", chunkIntervalMs = 50)
    val server = new GrpcStoreServer(spool, port = 0, clock = () => 1625478999L)
    val channel = ManagedChannelBuilder.forAddress("127.0.0.1", server.boundPort)
      .usePlaintext().build()
    try {
      // Store: one tagged + one plain metric
      val payload = CarbonPayload.encode(Seq(
        CarbonPayload.Metric("grpc.srv.cpu", Seq(CarbonPayload.Point(1625478240L, 1.5))),
        CarbonPayload.Metric("grpc.load;env=prod", Seq(CarbonPayload.Point(1625478300L, 2.5)))))
      val resp = ClientCalls.blockingUnaryCall(
        channel, GrpcStoreServer.StoreMethod, CallOptions.DEFAULT, payload)
      assert(resp.isEmpty, "google.protobuf.Empty is zero bytes")

      // StoreSync: records must be on disk when the call returns
      val syncPayload = CarbonPayload.encode(Seq(
        CarbonPayload.Metric("grpc.sync.metric", Seq(CarbonPayload.Point(1625478360L, 9.9)))))
      ClientCalls.blockingUnaryCall(
        channel, GrpcStoreServer.StoreSyncMethod, CallOptions.DEFAULT, syncPayload)
      val files = Files.list(java.nio.file.Paths.get(s"$dir/spool"))
        .toArray.map(_.toString).filter(f => f.endsWith(".tsv") || f.endsWith(".tsv.tmp"))
      val content = files.map(f => Files.readString(java.nio.file.Paths.get(f))).mkString
      assert(content.contains("grpc.sync.metric\t9.9\t1625478360\t1625478999"))
      assert(content.contains("grpc.srv.cpu\t1.5\t1625478240\t1625478999"))
      assert(content.contains("grpc.load?env=prod\t2.5\t1625478300\t1625478999"),
        "tag normalization applies on the gRPC path")

      // validation failure fails the whole RPC (grpc.go:84-110)
      val bad = CarbonPayload.encode(Seq(
        CarbonPayload.Metric("", Seq(CarbonPayload.Point(1L, 1.0)))))
      val e = intercept[StatusRuntimeException] {
        ClientCalls.blockingUnaryCall(
          channel, GrpcStoreServer.StoreMethod, CallOptions.DEFAULT, bad)
      }
      assert(e.getStatus.getCode.toString == "INVALID_ARGUMENT")
      assert(e.getStatus.getDescription.contains("empty metric name"))
    } finally {
      channel.shutdownNow()
      server.close()
      spool.close()
    }
  }
}
