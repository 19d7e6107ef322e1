package graft.sources

import org.sparkproject.connect.grpc.{MethodDescriptor, Server, ServerBuilder, ServerServiceDefinition, Status}
import org.sparkproject.connect.grpc.stub.{ServerCalls, StreamObserver}

import graft.core.{DropFilter, DroppedRing, GraphiteTags}
import graft.streaming.SpoolWriter

/**
 * REAL gRPC Store/StoreSync transport, wire-compatible with the
 * reference's `service Carbon` (/root/reference/grpc/carbon.proto,
 * receiver/grpc.go:39-202): any existing carbon gRPC client can
 * connect. Runs on the grpc-java runtime that the official Apache
 * Spark distribution ships inside spark-connect (shaded under
 * org.sparkproject.connect.grpc) — no new dependency.
 *
 * No protoc stubs are needed: the methods are registered with
 * raw-bytes marshallers and the Payload decode is the same
 * hand-rolled proto scan the framed transport uses
 * (CarbonPayload); the reply is google.protobuf.Empty, whose wire
 * form is zero bytes.
 *
 * Semantics (shared with FramedStoreServer via CarbonStore):
 * validation failures fail the whole RPC; StoreSync acks only after
 * the records are flushed to the OS chunk file (grpc.go:72-184 +
 * writer.go:265-283).
 */
final class GrpcStoreServer(
    spool: SpoolWriter,
    port: Int,
    tagConfig: GraphiteTags.TagConfig = GraphiteTags.Disabled,
    drops: DropFilter = DropFilter.Empty,
    clock: () => Long = () => System.currentTimeMillis() / 1000
) extends AutoCloseable {

  /** Per-receiver dropped ring (receiver/base.go:16). */
  val droppedRing = new DroppedRing(1000)

  private def handler(sync: Boolean): ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] =
    new ServerCalls.UnaryMethod[Array[Byte], Array[Byte]] {
      override def invoke(request: Array[Byte], obs: StreamObserver[Array[Byte]]): Unit =
        try CarbonStore.store(spool, tagConfig, drops, request, clock(), Some(droppedRing)) match {
          case Right(_) =>
            if (sync) spool.flushCurrent() // durable-before-ack
            obs.onNext(Array.emptyByteArray) // google.protobuf.Empty
            obs.onCompleted()
          case Left(err) =>
            obs.onError(Status.INVALID_ARGUMENT.withDescription(err).asRuntimeException())
        } catch {
          case e: Exception =>
            obs.onError(Status.INTERNAL.withDescription(String.valueOf(e.getMessage)).asRuntimeException())
        }
    }

  private val service = ServerServiceDefinition.builder("Carbon")
    .addMethod(GrpcStoreServer.StoreMethod, ServerCalls.asyncUnaryCall(handler(sync = false)))
    .addMethod(GrpcStoreServer.StoreSyncMethod, ServerCalls.asyncUnaryCall(handler(sync = true)))
    .build()

  private val server: Server = ServerBuilder.forPort(port)
    .addService(service)
    .asInstanceOf[ServerBuilder[_]]
    .build()
    .start()

  def boundPort: Int = server.getPort

  override def close(): Unit = {
    server.shutdownNow()
    server.awaitTermination()
  }
}

object GrpcStoreServer {

  /** Pass-through marshaller: the service layer sees raw proto bytes. */
  object BytesMarshaller extends MethodDescriptor.Marshaller[Array[Byte]] {
    override def stream(value: Array[Byte]): java.io.InputStream =
      new java.io.ByteArrayInputStream(value)
    override def parse(stream: java.io.InputStream): Array[Byte] = stream.readAllBytes()
  }

  private def method(name: String): MethodDescriptor[Array[Byte], Array[Byte]] =
    MethodDescriptor.newBuilder(BytesMarshaller, BytesMarshaller)
      .setFullMethodName(MethodDescriptor.generateFullMethodName("Carbon", name))
      .setType(MethodDescriptor.MethodType.UNARY)
      .build()

  /** `rpc Store(Payload) returns (Empty)` — full method name "Carbon/Store". */
  val StoreMethod: MethodDescriptor[Array[Byte], Array[Byte]] = method("Store")
  /** `rpc StoreSync(Payload) returns (Empty)` — "Carbon/StoreSync". */
  val StoreSyncMethod: MethodDescriptor[Array[Byte], Array[Byte]] = method("StoreSync")
}
