/* Minimal binary-compatible Kafka Connect API declaration — see ConnectorContext.java. */
package org.apache.kafka.connect.errors;

public class ConnectException extends RuntimeException {
    public ConnectException(String message) {
        super(message);
    }

    public ConnectException(String message, Throwable cause) {
        super(message, cause);
    }

    public ConnectException(Throwable cause) {
        super(cause);
    }
}
